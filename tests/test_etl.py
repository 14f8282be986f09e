"""ETL semantics tests: optimize/001..014 + wordlist + OA importer."""

import hashlib

from pyspark.sql import functions as F


def test_struct_house_fill_semantics(spark, geo):
    """Rural houses (city='', postcode='') get postcode from the postal
    polygon (optimize/004) then city from admin fallback (optimize/005);
    orphans outside every polygon keep NULL street_id and drop out of
    geocoding (strict NULL equality in 011)."""
    struct = geo["struct"]
    h = struct["struct_house"]
    streets = struct["struct_streets"]
    cities = struct["struct_cities"]
    rural_street = streets.filter("name = 'Feldweg'").collect()
    assert len(rural_street) == 1
    city = cities.filter(cities.id == rural_street[0].city_id).collect()[0]
    assert (city.name, city.postcode) == ("Südland County 1", "99999")
    orphans = h.filter("osm_id >= 500000").join(
        spark.read.parquet("fixtures/osm_house_number.parquet")
        .filter("street = 'Nowhere Lane'").select("osm_id"), "osm_id")
    assert orphans.count() == 5
    assert orphans.filter("street_id is not null").count() == 0


def test_content_derived_ids_are_stable(geo):
    """§7.4.3a: ids are pure functions of content (rerun-reproducible)."""
    for r in geo["struct"]["struct_cities"].select("id", "name", "postcode").collect():
        assert r.id == hashlib.sha256(f"city{r.name}{r.postcode}".encode()).hexdigest()


def test_building_houses_join_postal(spark, geo):
    """optimize/002: buildings with house numbers enter struct_house with
    centroid coordinates and the postal polygon's postcode."""
    h = geo["struct"]["struct_house"]
    bld = h.filter("osm_id >= 700000")
    assert bld.count() > 0
    # buildings in the fixture have house numbers >= 100
    assert bld.filter(F.col("house_number").cast("int") < 100).count() == 0


def test_wordlist_counts(spark, geo):
    """geocoder/001: word counts = street rows per city name + house rows per
    street name, summed across the union (A3/A4/U1)."""
    from geospark import etl

    wl = {r.word: r.ct for r in etl.build_wordlist(geo["struct"]).collect()}
    assert "Dickenreuth" in wl and "Feldweg" in wl
    # 'Marktplatz' appears only as a street name: ct = sum of houses on all
    # streets named Marktplatz
    h = geo["struct"]["struct_house"]
    s = geo["struct"]["struct_streets"]
    n_houses = (s.filter("name = 'Marktplatz'")
                .join(h, h.street_id == s.id, "inner").count())
    assert wl["Marktplatz"] == n_houses


def test_wordlist_oa_branch(spark, geo):
    """001:55-69: when OA tables exist, their city/street words union into
    the wordlist — a word that exists ONLY in OpenAddresses data ('Maple',
    from 'Maple Drive') must appear, weighted by its house count, and must
    be predictable through the full predict path."""
    from geospark import etl
    from geospark.predict import predict_text

    osm_only = {r.word for r in etl.build_wordlist(geo["struct"]).collect()}
    assert "Maple" not in osm_only

    wl = {r.word: r.ct for r in
          etl.build_wordlist(geo["struct"], oa=geo["oa"]).collect()}
    oa_street, oa_house = geo["oa"]["oa_street"], geo["oa"]["oa_house"]
    n_maple_houses = (oa_street.filter("street = 'Maple Drive'")
                      .join(oa_house, oa_house.street_id == oa_street.id, "inner").count())
    assert n_maple_houses > 0 and wl["Maple"] == n_maple_houses

    # the session wordlist (geo['wordlist']) includes the OA branch: an
    # OA-only word is now predictable end-to-end
    q = spark.createDataFrame([(1, "Mapl")], "query_id long, input string")
    words = [r.word for r in predict_text(spark, geo["wordlist"], q).collect()]
    assert "Maple" in words


def test_dup_clusters_connected_components(spark):
    """Chain + star + singleton-pair topologies: every node labels with the
    min doc_id of its component, regardless of edge direction or diameter."""
    from geospark import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain: component keeper 1
         (10, 11), (10, 12), (10, 13),  # star: keeper 10
         (20, 21)],                     # pair: keeper 20
        "doc_a long, doc_b long")
    out = {r.doc_id: r.keeper for r in dedup.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}
    # long chain converges (diameter > 2 requires multiple rounds)
    chain = spark.createDataFrame([(i, i + 1) for i in range(30, 40)],
                                  "doc_a long, doc_b long")
    outc = {r.doc_id: r.keeper for r in dedup.dup_clusters(chain).collect()}
    assert set(outc.values()) == {30} and len(outc) == 11


def test_dup_clusters_one_action_per_round(spark, monkeypatch):
    """Convergence detection is folded into the propagation round (VERDICT
    r3): the changed-flag count is the round's ONLY action and it
    materializes the lazy checkpoint as a side effect. Asserted DIRECTLY by
    spying on DataFrame actions during the loop (ADVICE r4: a raw
    statusTracker job budget was brittle against AQE/broadcast sub-job
    accounting) — a diameter-6 chain needs 7 rounds (6 propagation + the
    converged confirming one), so exactly 7 count() actions and no other
    action type may fire inside dup_clusters."""
    from geospark import dedup

    chain = spark.createDataFrame([(i, i + 1) for i in range(30, 36)],
                                  "doc_a long, doc_b long")
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract facade in Spark 4; classic instances override its methods)
    cls = type(chain)
    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = cls.count, cls.collect
    monkeypatch.setattr(
        cls, "count",
        lambda self: (calls.__setitem__("count", calls["count"] + 1),
                      orig_count(self))[1])
    monkeypatch.setattr(
        cls, "collect",
        lambda self: (calls.__setitem__("collect", calls["collect"] + 1),
                      orig_collect(self))[1])
    result = dedup.dup_clusters(chain)
    assert calls == {"count": 7, "collect": 0}, calls
    out = {r.doc_id: r.keeper for r in result.collect()}
    assert set(out.values()) == {30} and len(out) == 7


def test_jaccard_cap_drift(spark):
    """ADVICE r2: dedup_jaccard's max_df cap is a documented workload
    redefinition (capped-set Jaccard != true document Jaccard for pairs
    touching a frequent shingle). This pins all three contracts at fixture
    scale against a pure-Python reference: (a) the EXACT variant
    (max_df=None) computes true Jaccard, (b) a non-binding cap is a no-op,
    (c) an aggressive cap matches the capped-set reference exactly — and the
    capped-vs-exact drift stays quantified."""
    import collections
    import re

    from geospark import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter("doc_id < 40").cache()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(texts) >= 20

    def sh_set(text, n=3):
        ws = re.findall(r"[a-z0-9]+", (text or "").lower())
        if len(ws) >= n:
            return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
        return {" ".join(ws)}

    sets = {d: sh_set(t) for d, t in texts.items()}
    df_ct = collections.Counter(s for ss in sets.values() for s in ss)

    def ref_pairs(cap):
        capped = {d: {s for s in ss if cap is None or df_ct[s] <= cap}
                  for d, ss in sets.items()}
        out, ids = {}, sorted(capped)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                sa, sb = capped[a], capped[b]
                inter = len(sa & sb)
                if inter == 0:
                    continue
                j = round(inter / (len(sa) + len(sb) - inter), 6)
                if j >= 0.5:
                    out[(a, b)] = j
        return out

    def eng_pairs(**kw):
        return {(r.doc_a, r.doc_b): r.jaccard
                for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, **kw).collect()}

    exact = eng_pairs(max_df=None)
    assert exact == ref_pairs(None)                      # (a) true Jaccard
    assert eng_pairs(max_df=10 ** 9) == exact            # (b) non-binding cap
    cap = 4
    capped = eng_pairs(max_df=cap)
    assert capped == ref_pairs(cap)                      # (c) capped contract
    # quantified drift: capped values may differ from exact on shared pairs
    common = set(capped) & set(exact)
    drift = max((abs(capped[k] - exact[k]) for k in common), default=0.0)
    assert 0.0 <= drift < 0.5, drift
    docs.unpersist()


def test_oa_importer_semantics(spark, geo):
    """S3/A6: title-casing, content-hash dedup, last-wins house dedup,
    postcode uppercased, empty fields stored as single space, name NULL."""
    oa = geo["oa"]
    cities = {r.city for r in oa["oa_city"].collect()}
    # ' ' is the empty-named Lakeside source (COPY writes ' ' for empty)
    assert cities == {"Springfield", "Rivertown", " "}
    streets = {r.street for r in oa["oa_street"].collect()}
    assert streets == {"Oak Avenue", "Elm Street", "Maple Drive", "Seefeldweg"}
    units = {r.unit for r in oa["oa_street"].collect()}
    assert units == {" "}  # empty → single space (COPY writer bug-for-bug)
    houses = oa["oa_house"].collect()
    assert all(r.name is None for r in houses)
    assert len(houses) == 98  # 2×3×15 + 8 (dup number '1' deduped last-wins)


def test_oa_house_last_wins(spark, geo):
    """The duplicate 'oak avenue #1' row later in the CSV wins (dict
    overwrite at import_openaddress_data.py:410)."""
    from geospark import proj
    import numpy as np

    oa = geo["oa"]
    street = oa["oa_street"].filter("street = 'Oak Avenue'") \
        .join(oa["oa_city"].filter("city = 'Springfield'").select(F.col("id").alias("city_id")),
              "city_id").collect()
    h1 = oa["oa_house"].filter(
        (F.col("street_id") == street[0].id) & (F.col("housenumber") == "1")).collect()
    assert len(h1) == 1
    lon, _ = proj.merc_to_lonlat(np.array([h1[0].x]), np.array([0.0]))
    assert abs(float(lon[0]) - (-89.650 + 0.0001)) < 1e-9  # the LAST row's lon


def test_license_parsing(geo):
    lic = {r.source: r for r in geo["oa"]["oa_license"].collect()}
    assert lic["us/il/test"].attribution == "Example County GIS"
    assert lic["us/ny/rivertown"].attribution is None  # 'Yes' → absent
    assert lic["us/il/test"].license == "CC-BY-4.0"


def test_street_geometry_backfill(geo):
    """optimize/012: street geometry from a name-matching road whose bbox
    intersects the street extent; deterministic min-osm_id winner."""
    s = geo["struct"]["struct_streets"]
    with_geom = s.filter("geometry is not null").count()
    assert with_geom >= 48  # every city street matched its road line
    # rural Feldweg street has no road → NULL geometry
    assert s.filter("name = 'Feldweg' and geometry is not null").count() == 0


def test_oa_city_name_backfill_017(spark, geo):
    """optimize/017: the empty-named Lakeside OA source gets its city name
    from the admin_level-8 polygon containing its houses' centroid."""
    from geospark import oa as oamod

    filled = oamod.update_city_names_from_osm(
        spark, geo["oa"], geo["osm"]["osm_admin"], empty_values=(" ",))
    names = {r.postcode: r.city for r in filled.collect()}
    assert names["81669"] == "Lakeside"
    assert names["62704"] == "Springfield"  # untouched


def test_oa_manual_updates_018(spark, geo):
    from geospark import oa as oamod

    out = oamod.manual_city_name_updates(
        geo["oa"], mapping={"de/by/lakeside": "München"})
    names = {r.postcode: r.city for r in out.collect()}
    assert names["81669"] == "München"
    assert names["10501"] == "Rivertown"


def test_imposm_source_filters(spark, geo):
    """S1/S2: the mapping filters reproduce the 5 OSM tables exactly from
    raw tagged elements, and drop every reject row."""
    from geospark import sources

    raw = spark.read.parquet("fixtures/osm_raw_elements.parquet")
    t = sources.import_osm(raw)
    for name in ["osm_admin", "osm_postal_code", "osm_roads",
                 "osm_buildings", "osm_house_number"]:
        want = sorted(r.osm_id for r in geo["osm"][name].select("osm_id").collect())
        got = sorted(r.osm_id for r in t[name].select("osm_id").collect())
        assert got == want, name
    all_ids = {r.osm_id for n in t for r in t[n].select("osm_id").collect()}
    assert not ({900001, 900002, 900003, 900004} & all_ids)  # rejects dropped


def test_geohash_jvm_matches_kernel(spark):
    """r6: the struct_house geohash column moved to the pure-JVM expression
    (etl.geohash_col_jvm). It must stay bit-identical to the Arrow reference
    kernel (cells.geohash_encode via etl.geohash_col) — over the committed
    fixture houses AND a deterministic sweep of the whole projected plane
    (the only engine-dependent ops are exp/atan; everything else is
    exactly-rounded IEEE)."""
    from geospark import etl, proj
    from geospark.fixtures import FIXTURE_DIR

    fx = spark.read.parquet(f"{FIXTURE_DIR}/osm_house_number.parquet").select("x", "y")
    rnd = spark.range(0, 200_000).select(
        ((F.rand(7) - 0.5) * F.lit(2 * proj.L * 0.999)).alias("x"),
        ((F.rand(13) - 0.5) * F.lit(2 * proj.L * 0.999)).alias("y"))
    for df in (fx, rnd):
        bad = df.select(
            (etl.geohash_col(F.col("x"), F.col("y"))
             == etl.geohash_col_jvm(F.col("x"), F.col("y"))).alias("eq")) \
            .filter("not eq").count()
        assert bad == 0
