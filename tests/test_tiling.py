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


def test_salting_roundtrip(spark):
    df = spark.range(0, 1000).withColumn("key", F.lit(42))
    build = tiling.salted(df, "key", k=8, id_col="id")
    probe = tiling.explode_salts(spark.createDataFrame([(42,)], "key int"), k=8)
    joined = build.join(probe, ["key", "salt"], "inner")
    assert joined.count() == 1000  # every row still matches exactly once


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
