"""End-to-end geocoder behavior on the fixture world (SURVEY.md §5.3).

The named cases mirror the reference's own embedded example queries:
  * geocode_osm('Georgenstr', '34', NULL, 'Amberg', ...)  (003:496)
  * point_to_address_osm(...) with radius + limit          (004:101)
  * predict_text('Dickenr')                                (002:32)
"""

import pytest
from pyspark.sql import functions as F


def _fwd(spark, geo, **kw):
    from geospark.forward import forward_geocode

    defaults = dict(query_id=1, road=None, house_number=None, postcode=None,
                    city=None, country=None, center_lat=None, center_lon=None,
                    radius=20000, limit=20)
    defaults.update(kw)
    q = spark.createDataFrame(
        [tuple(defaults.values())],
        "query_id long, road string, house_number string, postcode string, "
        "city string, country string, center_lat double, center_lon double, "
        "radius int, limit int")
    return forward_geocode(spark, geo["tables"], q)


def test_forward_reference_demo_query(spark, geo):
    # SELECT * FROM geocode_osm('Georgenstr', '34', NULL, 'Amberg', …)
    rows = _fwd(spark, geo, road="Georgenstr", house_number="34", city="Amberg").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.road, r.house_number, r.city, r.postcode) == ("Georgenstraße", "34", "Amberg", "92224")
    assert r.state == "Nordland" and r.house is None
    assert r.distance is None  # no center → NULL distance (O1 NULLS LAST)
    assert r.license_id == "00000000-0000-0000-0000-000000000000"


def test_forward_postcode_precedence_over_city(spark, geo):
    # geocode_osm dispatch: postcode branch wins (003:474-492); the bogus
    # city term must be ignored entirely
    rows = _fwd(spark, geo, road="Hauptstr", postcode="95505", city="Zzz").collect()
    assert rows and all(r.city == "Dickenreuth" for r in rows)


def test_forward_country_restriction(spark, geo):
    rows = _fwd(spark, geo, road="Main Street", country="Adressia", limit=100).collect()
    assert rows and all(r.state in ("Eastmark", "Westmark") for r in rows)
    # unknown country → no polygon passes the % threshold → zero rows
    assert _fwd(spark, geo, road="Main Street", country="Xyzzyland").count() == 0


def test_forward_center_radius_and_ranking(spark, geo):
    from geospark import proj
    import numpy as np
    # center on Amberg; huge radius; results ordered by planar distance
    lon, lat = proj.merc_to_lonlat(np.array([1037500.0]), np.array([6225000.0]))
    rows = _fwd(spark, geo, road="Georgenstr", center_lat=float(lat[0]),
                center_lon=float(lon[0]), radius=10_000_000, limit=50).collect()
    assert rows
    dists = [r.distance for r in rows]
    assert dists == sorted(dists)
    assert all(d is not None for d in dists)


def test_reverse_basic_and_limit(spark, geo):
    from geospark.reverse import reverse_geocode

    rq = spark.read.parquet("fixtures/rev_queries.parquet")
    out = reverse_geocode(spark, geo["tables"], rq)
    per_q = {r["query_id"]: r["n"] for r in
             out.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 10 for n in per_q.values())
    # distances monotone per query
    pdf = out.orderBy("query_id").toPandas()
    for qid, grp in pdf.groupby("query_id"):
        d = grp["distance"].tolist()
        assert d == sorted(d)
        assert all(x <= 150.0 for x in d)


def test_reverse_oa_fallback(spark, geo):
    from geospark.reverse import reverse_geocode

    rq = spark.read.parquet("fixtures/rev_queries.parquet")
    out = reverse_geocode(spark, geo["tables"], rq).toPandas()
    oa_rows = out[out.license_id != "00000000-0000-0000-0000-000000000000"]
    assert len(oa_rows) > 0  # the Springfield OA query fell back (J11)
    assert set(oa_rows.road) == {"Oak Avenue"}
    # the middle-of-nowhere query returns nothing from either source
    assert 6 not in set(out.query_id)


def test_reverse_scalar_limit1_agg_path_equivalence(spark, geo):
    """scalar_limit=1 fast path (map-side top-1 aggregate) == the window
    path, row for row. The window path shuffles EVERY candidate row by
    query_id to rank it (measured 4.2 GB / ~50M rows at bench sf4.0 for a
    top-1-per-query answer); the fast path partial-aggregates
    count()+min_by() inside the candidate-join stage, so only one skinny
    row per (query, partition) reaches the exchange. Exactness argument:
    row_number()==1 under (distance asc, id asc) is min_by keyed on
    struct(distance, id), and id is unique."""
    from geospark.reverse import reverse_geocode

    rq = (spark.read.parquet("fixtures/rev_queries.parquet")
          .withColumn("limit", F.lit(1)))
    base_df = reverse_geocode(spark, geo["tables"], rq)
    fast_df = reverse_geocode(spark, geo["tables"], rq, scalar_limit=1)
    key = ["query_id", "road", "house_number", "x", "y"]
    assert sorted(map(tuple, base_df.collect()), key=str) \
        == sorted(map(tuple, fast_df.collect()), key=str)
    # structural pin: the fast path drops the per-candidate windows (round-1
    # count+rank, pre-rank) — only the final admin-multiplicity window stays
    n_win_base = base_df._jdf.queryExecution().executedPlan().toString().count("Window")
    n_win_fast = fast_df._jdf.queryExecution().executedPlan().toString().count("Window")
    assert n_win_fast < n_win_base


def test_forward_scalar_limit1_agg_path_equivalence(spark, geo):
    """Forward twin of the reverse test above: scalar_limit=1 replaces BOTH
    ranking windows (the pre-rank over the full candidate set and the final
    post-PIP ranking) with map-side min_by top-1 aggregates. The pre-rank
    window shuffled AND sorted every candidate row by query_id (profiled at
    bench sf4.0: twin 19-task Sort stages spilling ~12 GiB each). Exactness:
    row_number()==1 under (distance asc NULLS LAST, trgm_dist, id[, a4/a6
    names NULLS LAST]) == min_by on (coalesce(distance, inf), trgm_dist,
    id[, isNull/coalesce-encoded names]); id is unique per house and ties
    beyond it only for PIP-duplicated rows of the same house."""
    from geospark.forward import forward_geocode

    fq = (spark.read.parquet("fixtures/fwd_queries.parquet")
          .withColumn("limit", F.lit(1)))
    # materialize=False: the eager localCheckpoint truncates the plan to a
    # Scan ExistingRDD, hiding the windows from the structural pin below
    reg_base, reg_fast = [], []
    base_df = forward_geocode(spark, geo["tables"], fq,
                              materialize=False, persist_registry=reg_base)
    fast_df = forward_geocode(spark, geo["tables"], fq, scalar_limit=1,
                              materialize=False, persist_registry=reg_fast)
    assert sorted(map(tuple, base_df.collect()), key=str) \
        == sorted(map(tuple, fast_df.collect()), key=str)
    # structural pin: the fast path carries NO ranking window over the
    # candidate set — the only windows left are the tiny prefix-index
    # row_numbers over distinct query terms (identical in both plans)
    n_win_base = base_df._jdf.queryExecution().executedPlan().toString().count("Window")
    n_win_fast = fast_df._jdf.queryExecution().executedPlan().toString().count("Window")
    assert n_win_fast < n_win_base
    for cached in reg_base + reg_fast:
        cached.unpersist()


def test_top1_binary_key_order_equivalence(spark):
    """The packed top-1 path (r6: _pack_candidates carries the sha256 hex
    ids as BINARY(32) through the partial SortAggregate) must pick the SAME
    winners as the hex-string form. Ids are chosen adversarially: distances
    tie exactly, forcing the id tiebreak, and the leading bytes straddle
    0x7f/0x80 and 0x00/0xff — a SIGNED bytewise binary comparison would
    invert those pairs, so this pins the required UNSIGNED ordering (which
    is order-isomorphic to lexicographic lowercase-hex comparison)."""
    from geospark.reverse import _pack_candidates, _top1_per_query, _unpack_top1

    pairs = [("7f" + "0" * 62, "80" + "0" * 62),   # signed flip at 0x7f/0x80
             ("ff" + "e" * 62, "00" + "e" * 62),   # signed flip at 0xff/0x00
             ("0a" + "b" * 62, "a0" + "b" * 62)]   # digit-vs-letter nibble
    street = "c3" * 32
    rows = [(qid, hid, street, str(qid), 1.0 * qid, 2.0 * qid, 7.5)
            for qid, (a, b) in enumerate(pairs, start=1) for hid in (a, b)]
    cand = spark.createDataFrame(
        rows, "query_id long, id string, street_id string, house_number string, "
              "x double, y double, distance double")
    hex_rows = sorted(map(tuple, _top1_per_query(cand)
                          .select(*cand.columns).collect()))
    bin_rows = sorted(map(tuple, _unpack_top1(_top1_per_query(_pack_candidates(cand)))
                          .select(*cand.columns).collect()))
    assert hex_rows == bin_rows
    # and the winner is the hex-lexicographic minimum of each tied pair
    assert [r[1] for r in hex_rows] == [min(a, b) for a, b in pairs]


def test_sim_ge_arrays_matches_threshold_form(spark):
    """The single-intersect threshold predicate (r6: 13*shared >= 3*(na+nb))
    must agree with `sim_from_arrays >= 0.3` on every pair — including exact
    boundary hits (shared/(na+nb-shared) == 3/10) and empty sides. Arrays
    are constructed directly so the boundary combinations are guaranteed to
    occur, not left to corpus luck."""
    from geospark.tables import sim_from_arrays, sim_ge_arrays

    def grams(prefix, n):
        return [f"{prefix}{i:03d}" for i in range(n)]

    rows = []
    rid = 0
    for na in range(0, 9):
        for nb in range(0, 9):
            for s in range(0, min(na, nb) + 1):
                rows.append((rid, grams("s", s) + grams("a", na - s),
                             grams("s", s) + grams("b", nb - s)))
                rid += 1
    # plus the exact 3/10 boundary at bigger sizes: shared=3, na+nb=13
    rows.append((rid, grams("s", 3) + grams("a", 3), grams("s", 3) + grams("b", 4)))
    df = spark.createDataFrame(rows, "rid long, ta array<string>, tb array<string>")
    out = df.select(
        "rid",
        (sim_from_arrays(F.col("ta"), F.col("tb")) >= 0.3).alias("old"),
        sim_ge_arrays(F.col("ta"), F.col("tb")).alias("new"),
    ).collect()
    assert all(bool(r.old) == bool(r.new) for r in out), \
        [r.rid for r in out if bool(r.old) != bool(r.new)]
    # the boundary row is a keeper in both forms
    assert [r.new for r in out if r.rid == rid] == [True]


def test_admin_overlap_multiplicity(spark, geo):
    """Overlapping admin_level-6 polygons duplicate result rows exactly like
    the reference's LEFT JOIN (§7.4.7) — never dedup."""
    rows = _fwd(spark, geo, road="Georgenstr", city="Amberg", limit=200).collect()
    west = [r for r in rows if r.x < 1037900.0]
    counties = {r.county for r in west}
    assert counties == {"Nordland County 1", "Overlap Special District"}
    # each western house appears once per matching county polygon
    from collections import Counter
    per_house = Counter((r.x, r.y) for r in west)
    assert set(per_house.values()) == {2}


def test_predict_reference_demo(spark, geo):
    from geospark.predict import predict_text

    q = spark.createDataFrame([(1, "Dickenr")], "query_id long, input string")
    rows = predict_text(spark, geo["wordlist"], q).collect()
    words = [r.word for r in rows]
    assert "Dickenreuth" in words and "Dickenreuther" in words
    # ordering: dist asc, ct desc, len asc, word asc (002:23-28)
    keys = [(r.dist, -r.ct, len(r.word), r.word) for r in rows]
    assert keys == sorted(keys)


def test_predict_against_pure_python_reference(spark, geo):
    """Engine predict == a direct pure-Python evaluation of the 002 SQL
    semantics over the same wordlist (kernel-level independent check)."""
    from geospark import metaphone, text
    from geospark.predict import predict_text

    wl = geo["wordlist"].select("word", "ct").collect()
    user_input = "Georgenstr"

    def reference_predict(inp):
        qp, qa = metaphone.double_metaphone(inp)
        cands = []
        for r in wl:
            wp, wa = metaphone.double_metaphone(r.word)
            if any(text.is_similar(a, b) for a in (wp, wa) for b in (qp, qa)):
                dist = text.prefix_levenshtein(r.word, inp)
                if dist < 3:
                    cands.append((dist, -r.ct, len(r.word), r.word))
        return [w for *_, w in sorted(cands)[:10]]

    q = spark.createDataFrame([(1, user_input)], "query_id long, input string")
    got = [r.word for r in predict_text(spark, geo["wordlist"], q)
           .orderBy("dist", F.desc("ct"), F.length("word"), "word").collect()]
    assert got == reference_predict(user_input)


def test_format_addresses(spark, geo):
    from geospark import entry_queries as eq

    pdf = eq.q_format_addresses(spark, "fixtures").toPandas()
    assert len(pdf) > 0
    sample = pdf.iloc[0]
    assert sample.road in sample.formatted
    assert "\n" in sample.formatted  # multi-line default template


def test_partition_invariance(spark, geo):
    """north_rule: identical results regardless of parallelism — same query
    at shuffle.partitions 32 vs 7 must produce identical sorted output."""
    from geospark import entry_queries as eq

    def run():
        pdf = eq.q_reverse_geocode(spark, "fixtures").toPandas()
        cols = sorted(pdf.columns)
        return sorted(map(tuple, pdf[cols].astype(str).values.tolist()))

    base = run()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert base == alt


def _unstructured(spark, geo, term, limit=20, expand=True):
    from geospark.forward import forward_geocode_unstructured

    q = spark.createDataFrame(
        [(1, term, None, None, None, 20000, limit)],
        "query_id long, search_term string, country string, center_lat double, "
        "center_lon double, radius int, limit int")
    return forward_geocode_unstructured(spark, geo["tables"], q, expand=expand)


def test_expansion_finds_abbreviated_streets(spark, geo):
    """The libpostal /expand stage (VERDICT r3 next-round #1): abbreviated
    unstructured queries must land on the full street names."""
    # "123 Main St" doesn't parse as 'road hn, pc city' → whole expanded
    # string becomes the road; trigram match reaches "Main Street"
    rows = _unstructured(spark, geo, "123 Main St").collect()
    assert rows and all(r.road == "Main Street" for r in rows)

    # German glued-suffix abbreviation, parsed form: exact same result rows
    # as the unabbreviated query
    abbr = _unstructured(spark, geo, "Hauptstr. 5, 95505 Dickenreuth", limit=10).collect()
    full = _unstructured(spark, geo, "Hauptstraße 5, 95505 Dickenreuth", limit=10).collect()
    key = lambda r: (r.road, r.house_number, r.postcode, r.city, r.x, r.y)
    assert sorted(map(key, abbr)) == sorted(map(key, full)) and abbr
    assert abbr[0].road == "Hauptstraße"

    # expand=False reproduces the reference's no-postal fallback (raw term,
    # trigram tolerance alone): the abbreviated German query doesn't parse
    # ('.' not a road char), the whole raw string becomes the road, its
    # similarity to "Hauptstraße" falls under 0.3, and the CITY name leaking
    # into the road trigrams drags every result onto the wrong street
    # ("Dickenreuther Weg"). Expansion is what recovers the true match —
    # exactly libpostal's recall contribution.
    raw_de = _unstructured(spark, geo, "Hauptstr. 5, 95505 Dickenreuth",
                           expand=False).collect()
    assert raw_de and all(r.road != "Hauptstraße" for r in raw_de)
    # where trigram tolerance already suffices, expansion must still WIN on
    # match quality: the expanded road is strictly closer to the true name
    raw = _unstructured(spark, geo, "123 Main St", expand=False).collect()
    assert raw and min(r.trgm_dist for r in rows) < min(r.trgm_dist for r in raw)


def test_expansion_cross_engine_equivalence(spark):
    """The rule table must expand IDENTICALLY in all three engines: Spark
    (Java regex, batch path), DuckDB (RE2, oracle), Python (re, service) —
    pinned over abbreviations, no-op inputs, unicode stems, case variants,
    and multi-rule strings."""
    import duckdb

    from geospark import postal

    samples = [
        "Georgenstr. 34, 92224 Amberg", "Hauptstr 5, 95505 Dickenreuth",
        "123 Main St", "Main St.", "Bahnhofstr. 3", "Königstr. 7, 80331 München",
        "5th Ave Apt 3B", "Ste 100, 200 Oak Blvd", "Georgenstraße 34",
        "Strasse des 17. Juni", "st st st", "STR 9", "Nr. 5", "Mt Everest Rd",
        "Pl. de la Concorde", "complete gibberish nowhere", "", "12345",
        "Höhenweg 3", "Östr 1",
        # \b landmines: unicode-adjacent abbreviation lookalikes (Java/Python
        # word boundaries are unicode-aware, RE2's ASCII — explicit delimiter
        # classes must keep all three engines identical here)
        "Wüst 3", "Strümpfelbach", "Großstadtstr. 9", "Ernst-Reuter-Pl",
        # same-rule adjacency (consumed delimiter → second-pass rule)
        "st st", "Hauptstr Georgenstr", "Apt Apt 5", "St.St. 2",
        # delimiters: hyphen/slash/comma tails, '.' not followed by space
        "Oak Ln-West", "Main St/Church Rd", "Mühlenstr.,Altstadt", "St.5",
    ]
    py = [postal.expand_address(s) for s in samples]
    con = duckdb.connect()
    db = [con.execute(f"SELECT {postal.expand_term_sql('?')}", [s]).fetchone()[0]
          for s in samples]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
    sp_rows = sdf.select("i", postal.expand_term_col(F.col("t")).alias("x")).collect()
    sp = [r.x for r in sorted(sp_rows, key=lambda r: r.i)]
    assert py == db == sp, [t for t in zip(samples, py, db, sp) if len(set(t[1:])) > 1]


def test_normalized_tokens_and_tokenize():
    from geospark import postal

    assert postal.tokenize("Hauptstr. 5, 95505 X") == ["Hauptstr", "5", "95505", "X"]
    toks = postal.normalized_tokens("Georgenstr. 34b, 92224 Amberg")
    assert toks == [("georgenstraße", "word"), ("34b", "alphanumeric"),
                    ("92224", "numeric"), ("amberg", "word")]
