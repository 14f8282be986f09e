"""Skew handling (X8) + the shuffle-based tiled PIP join."""

from pyspark.sql import functions as F

from geospark import tiling


def test_mega_cell_detected_and_split(spark, geo):
    """The fixture mega-city holds >30% of all houses in one res-15 cell
    (FIXTURES.md §6); adaptive splitting to child resolution must break it
    into multiple balanced cells without changing row count."""
    h = geo["struct"]["struct_house"]
    total = h.count()
    hot = tiling.hot_cells(h, threshold=int(total * 0.2))
    assert len(hot) == 1 and max(hot.values()) > 0.3 * total

    split = tiling.adaptive_cells(spark, h, hot, steps=3)
    assert split.count() == total
    new_hot = tiling.hot_cells(split, threshold=int(total * 0.2))
    assert new_hot == {}  # no cell above 20% anymore
    # cold cells untouched
    cold_before = h.filter(~F.col("cell_id").isin(list(hot))).select("cell_id")
    cold_after = split.join(h.select(F.col("cell_id").alias("orig")),
                            F.col("cell_id") == F.col("orig"), "left_semi")
    assert cold_after.count() == cold_before.count()


def test_adaptive_split_wired_into_etl(spark, geo):
    """build_struct_tables with a triggering hot-cell threshold must write a
    house table whose mega-cell ids are re-encoded at child resolution
    (north_rule 'adaptive cell splitting'), with reverse-geocode results
    bit-identical to the unsplit build (cell_id is a locality key only —
    the grid join keys on ix/iy)."""
    from geospark import etl
    from geospark.fixtures import FIXTURE_DIR
    from geospark.reverse import reverse_geocode
    from geospark.tables import GeocoderTables

    h0 = geo["struct"]["struct_house"]
    total = h0.count()
    thr = int(total * 0.2)  # the fixture mega-city holds >30% of all houses

    osm = geo["osm"]
    struct2 = etl.build_struct_tables(spark, osm, hot_cell_rows=thr)
    h2 = struct2["struct_house"]

    # row count preserved; the written table carries split (finer-res) ids
    assert h2.count() == total
    res_counts = {int(r["res"]): int(r["n"]) for r in
                  h2.groupBy(F.shiftright("cell_id", 53).alias("res"))
                    .agg(F.count("*").alias("n")).collect()}
    assert 15 in res_counts and any(r > 15 for r in res_counts), res_counts
    # no remaining cell above the threshold
    from geospark import tiling
    assert tiling.hot_cells(h2, thr) == {}

    # reverse results unchanged vs the session's default-threshold build
    rq = spark.read.parquet(f"{FIXTURE_DIR}/rev_queries.parquet")
    t2 = GeocoderTables(spark, struct2, osm["osm_admin"])
    base = reverse_geocode(spark, geo["tables"], rq, with_fallback=False)
    split = reverse_geocode(spark, t2, rq, with_fallback=False)
    key = lambda r: (r.query_id, r.road, r.house_number, round(r.distance, 9))
    assert sorted(map(key, base.collect())) == sorted(map(key, split.collect()))


def test_salting_roundtrip(spark):
    df = spark.range(0, 1000).withColumn("key", F.lit(42))
    build = tiling.salted(df, "key", k=8, id_col="id")
    probe = tiling.explode_salts(spark.createDataFrame([(42,)], "key int"), k=8)
    joined = build.join(probe, ["key", "salt"], "inner")
    assert joined.count() == 1000  # every row still matches exactly once


def test_verify_kernel_vectorized_perf():
    """The grouped-by-polygon verify kernel must (a) agree exactly with the
    naive per-row loop and (b) be >=10x faster on a 1e5-pair batch — the
    regime the shuffle path exists for (polygon sets too big to broadcast)."""
    import time

    import numpy as np
    import pandas as pd

    from geospark.geometry import as_rings, points_in_polygon

    rng = np.random.RandomState(7)
    n_polys, n_pairs = 50, 100_000
    # concave-ish polygons: jittered 12-gon rings around grid centers
    ring_objs = []
    for p in range(n_polys):
        cx, cy = (p % 10) * 1000.0, (p // 10) * 1000.0
        ang = np.linspace(0, 2 * np.pi, 13)[:-1]
        rad = 300.0 + 150.0 * rng.rand(12)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        ring_objs.append([np.vstack([ring, ring[:1]]).tolist()])
    pids = rng.randint(0, n_polys, n_pairs).astype(np.int64)
    # pre-sorted by pid, like the join output within a partition usually is
    pids.sort(kind="stable")
    cx = (pids % 10) * 1000.0
    cy = (pids // 10) * 1000.0
    xs = cx + rng.uniform(-500, 500, n_pairs)
    ys = cy + rng.uniform(-500, 500, n_pairs)
    rings = pd.Series([ring_objs[p] for p in pids])

    t0 = time.perf_counter()
    fast = tiling.verify_pairs_kernel(pids, xs, ys, rings)
    t_fast = time.perf_counter() - t0

    t0 = time.perf_counter()
    slow = np.zeros(n_pairs, dtype=bool)
    for i in range(n_pairs):
        slow[i] = bool(points_in_polygon(xs[i:i + 1], ys[i:i + 1],
                                         as_rings(rings.iloc[i]))[0])
    t_slow = time.perf_counter() - t0

    assert (fast == slow).all()
    assert fast.any() and not fast.all()  # non-trivial workload
    assert t_slow / max(t_fast, 1e-9) >= 10.0, (t_slow, t_fast)


def test_verify_kernel_empty_and_unsorted():
    import numpy as np
    import pandas as pd

    assert len(tiling.verify_pairs_kernel(
        np.array([], dtype=np.int64), np.array([]), np.array([]), pd.Series([], dtype=object))) == 0
    # unsorted pids: grouping must not assume pre-sorted batches
    sq = [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]
    far = [[[100.0, 100.0], [110.0, 100.0], [110.0, 110.0], [100.0, 110.0], [100.0, 100.0]]]
    pids = np.array([2, 1, 2, 1], dtype=np.int64)
    xs = np.array([5.0, 5.0, 105.0, 105.0])
    ys = np.array([5.0, 5.0, 105.0, 105.0])
    rings = pd.Series([far, sq, far, sq])
    out = tiling.verify_pairs_kernel(pids, xs, ys, rings)
    assert out.tolist() == [False, True, True, False]


def test_tiled_pip_left_join_identity(spark):
    """how='left' must identify points by a carried surrogate id — NOT by
    (x, y) float equality (round-3 verdict wrong-item 1): two DISTINCT
    points sharing coordinates each keep their own output row, matched
    points appear once per containing polygon, unmatched once with NULL
    attrs."""
    poly = spark.createDataFrame(
        [(1, "zoneA",
          [[[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0], [0.0, 0.0]]],
          0.0, 0.0, 100.0, 100.0)],
        "osm_id long, name string, rings array<array<array<double>>>, "
        "xmin double, ymin double, xmax double, ymax double")
    pts = spark.createDataFrame(
        [  # two distinct points at IDENTICAL matched coordinates
            (1, 50.0, 50.0), (2, 50.0, 50.0),
            # two distinct points at IDENTICAL unmatched coordinates
            (3, 500.0, 500.0), (4, 500.0, 500.0),
            # ordinary matched / unmatched singletons
            (5, 10.0, 10.0), (6, -300.0, -300.0),
        ], "pt long, x double, y double")
    out = tiling.tiled_pip_join(spark, pts, poly, res=6, how="left").collect()
    got = sorted((r.pt, r["__attr"]) for r in out)
    assert got == [(1, "zoneA"), (2, "zoneA"), (3, None), (4, None),
                   (5, "zoneA"), (6, None)]


def test_adaptive_cells_rejects_mixed_resolution(spark, geo):
    """A hot-cell map mixing resolutions must fail loudly — the split kernel
    reads the resolution off one member, so mixing would silently mis-encode
    children (ADVICE r3)."""
    import pytest

    h = geo["struct"]["struct_house"]
    mixed = {(15 << 53) + 5: 10, (17 << 53) + 9: 10}
    with pytest.raises(ValueError, match="mixes resolutions"):
        tiling.adaptive_cells(spark, h, mixed)
    with pytest.raises(ValueError, match="mixes resolutions"):
        tiling.adaptive_query_cells(spark, mixed)


def test_tiled_pip_join_matches_broadcast(spark, geo):
    """The shuffle path (polygons too big to broadcast) must produce the
    same point->polygon pairs as the broadcast prepared-geometry path."""
    from geospark import spatial

    admin6 = spark.read.parquet("fixtures/osm_admin.parquet").filter("admin_level = 6")
    pts = geo["struct"]["struct_house"].select("id", "x", "y").limit(500)

    bc = spatial.pip_join(spark, pts, admin6, how="inner", out_col="nm")
    tl = tiling.tiled_pip_join(spark, pts, admin6, res=8, how="inner")
    a = sorted((r.id, r.nm) for r in bc.collect())
    b = sorted((r.id, r["__attr"]) for r in tl.collect())
    assert a == b
