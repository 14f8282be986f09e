"""Reverse geocoding: coordinate batches -> nearest addresses.

Semantics: sql/geocoder/004-reverse_geocoding.sql:68-89 + the client-side
LIMIT and OSM->OA fallback of osmgeocoder/reverse.py:39-63, re-expressed per
the north_star as *k-ring cell expansion + sort-merge equi-join + window
top-k*:

  query point -> covering cells of its radius window (P3's 1-D band filter
  generalized to 2-D)  ->  equi-join with houses on cell_id  ->  exact
  planar-distance residual filter (F9)  ->  street/city dim joins (J1/J2)
  ->  admin_level 4/6 containment via broadcast PIP with explode_outer
  (J3, multiplicity preserved)  ->  row_number() over
  (query ORDER BY distance) <= limit (J10/O2).

The join side is houses (the 10^12-scale relation at design scale): it is
pre-partitioned/sorted by cell_id by the ETL, so the equi-join prunes to the
few cells each query touches; no shuffle of the big side beyond the join
itself, and the query side is the small one (broadcastable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from . import cells as cell_mod
from . import proj, spatial
from .etl import GRID_JOIN_RES, HOUSE_CELL_RES
from .tables import GeocoderTables

ZERO_UUID = "00000000-0000-0000-0000-000000000000"

RESULT_COLS = ["query_id", "house", "road", "house_number", "postcode", "city",
               "county", "state", "x", "y", "distance", "license_id"]


def covering_cells_col(x_col, y_col, radius_col, res: int = HOUSE_CELL_RES):
    """Array of Morton cell ids covering the radius window (Arrow kernel) —
    kept for cell_id-keyed consumers; the reverse join itself uses the pure
    JVM (ix, iy) grid expansion below."""

    @F.pandas_udf(ArrayType(LongType()))
    def _cov(x: pd.Series, y: pd.Series, r: pd.Series) -> pd.Series:
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        rs = r.to_numpy(np.float64)
        return pd.Series(
            [c.tolist() for c in cell_mod.covering_cells_bbox(xs - rs, ys - rs, xs + rs, ys + rs, res)]
        )

    return _cov(x_col, y_col, radius_col)


def _grid_expand(q: DataFrame, res: int = GRID_JOIN_RES,
                 g_col: str = "radius") -> DataFrame:
    """k-ring expansion as pure JVM expressions: one row per (ix, iy) grid
    cell covering [qx±g, qy±g] (usually ≤4 rows per query —
    sequence + two explodes, fully inside whole-stage codegen)."""
    from .etl import grid_cols

    x0, y0 = grid_cols(F.col("qx") - F.col(g_col), F.col("qy") - F.col(g_col), res)
    x1, y1 = grid_cols(F.col("qx") + F.col(g_col), F.col("qy") + F.col(g_col), res)
    return (q.withColumn("__ix0", x0).withColumn("__ix1", x1)
            .withColumn("__iy0", y0).withColumn("__iy1", y1)
            .withColumn("ix", F.explode(F.sequence(F.col("__ix0"), F.col("__ix1"))))
            .withColumn("iy", F.explode(F.sequence(F.col("__iy0"), F.col("__iy1"))))
            .drop("__ix0", "__ix1", "__iy0", "__iy1"))


def _admin_cols(spark, tables: GeocoderTables, df: DataFrame) -> DataFrame:
    """LEFT JOIN osm_admin a4/a6 ON ST_Contains (004:82-83): broadcast PIP,
    explode_outer preserves both left rows and overlap multiplicity. Both
    levels probe in ONE Arrow pass (multi_pip_match_col); the sequential
    explodes reproduce the a4-matches x a6-matches join multiplicity."""
    df = df.withColumn("__ad", spatial.multi_pip_match_col(
        spark, {"a4": tables.prepared_admin(4), "a6": tables.prepared_admin(6)},
        "x", "y"))
    df = df.withColumn("a4_name", F.explode_outer("__ad.a4"))
    df = df.withColumn("a6_name", F.explode_outer("__ad.a6")).drop("__ad")
    return df


def reverse_geocode(spark, tables: GeocoderTables, queries: DataFrame,
                    with_fallback: bool = True) -> DataFrame:
    """``queries``: (query_id, lat, lon, radius, limit) in EPSG:4326.

    Returns the address_and_distance shape + query_id; row order is
    recovered per query by (distance, tiebreaks) via row_number <= limit.
    """
    q = queries.select(
        "query_id",
        proj.merc_x_col(F.col("lon")).alias("qx"),
        proj.merc_y_col(F.col("lat")).alias("qy"),
        F.col("radius").cast("double").alias("radius"),
        F.col("limit").cast("int").alias("limit"),
    )
    return _reverse_projected(spark, tables, q, with_fallback)


def reverse_geocode_epsg3857(spark, tables: GeocoderTables, queries: DataFrame,
                             with_fallback: bool = True) -> DataFrame:
    """``queries``: (query_id, x, y, radius, limit) already in EPSG:3857 —
    the reference's Geocoder.reverse_epsg3857 entry
    (osmgeocoder/geocoder.py:199-247), for pipelines that store projected
    points. Identical plan to reverse_geocode with the lon/lat projection
    skipped."""
    q = queries.select(
        "query_id",
        F.col("x").cast("double").alias("qx"),
        F.col("y").cast("double").alias("qy"),
        F.col("radius").cast("double").alias("radius"),
        F.col("limit").cast("int").alias("limit"),
    )
    return _reverse_projected(spark, tables, q, with_fallback)


def _reverse_projected(spark, tables: GeocoderTables, q: DataFrame,
                       with_fallback: bool) -> DataFrame:
    # NULL radius -> no rows (the reference's ST_DWithin(…, NULL) is never
    # true). Filtered up front: F.least(G1_METERS, radius) in the two-round
    # kNN would otherwise silently treat NULL as a 32 m search window.
    q = q.filter(F.col("radius").isNotNull())

    osm = _reverse_osm(spark, tables, q)
    if not with_fallback or tables.oa is None:
        return osm.select(*RESULT_COLS)

    # J11 source fallback: OA only for queries with zero OSM rows
    # (osmgeocoder/reverse.py:52-63) — left-anti on the hit set
    hits = osm.select("query_id").distinct()
    q_missed = q.join(hits, "query_id", "left_anti")
    oa = _reverse_oa(spark, tables, q_missed)
    return osm.select(*RESULT_COLS).unionByName(oa.select(*RESULT_COLS))


def _candidates(q: DataFrame, houses: DataFrame,
                radius_col: str = "radius", res: int = GRID_JOIN_RES) -> DataFrame:
    """grid expansion + equi-join + exact residual distance filter.
    ``radius_col`` bounds both the covering-cell window and the distance
    residual, so by construction every house with distance <= radius_col is
    in the join output (the cell bbox covers the closed disk)."""
    qc = _grid_expand(q.withColumn("__g", F.col(radius_col)), res=res, g_col="__g")
    if res == GRID_JOIN_RES:
        keyed = houses
    else:
        # per-round finer grid keys, computed on the fly from cached x/y
        # (pure arithmetic — no re-materialization of the big side)
        from .etl import grid_cols
        fx, fy = grid_cols(F.col("x"), F.col("y"), res)
        keyed = houses.withColumn("ix", fx).withColumn("iy", fy)
    # join strategy left to AQE: at small batch sizes it runtime-broadcasts
    # the query-cell side; at design scale (10^9-row query batches) neither
    # side is broadcastable and this becomes a shuffle join on (ix, iy) with
    # houses pre-partitioned by cell — never force a driver-side broadcast
    # build of a side that scales with the batch
    cand = keyed.join(qc, ["ix", "iy"], "inner")
    # 004:85-87 — the 1-D ST_X band prefilter, then exact ST_DWithin
    cand = cand.filter(
        (F.col("x") >= F.col("qx") - F.col("__g"))
        & (F.col("x") <= F.col("qx") + F.col("__g"))
    ).withColumn("distance", F.sqrt(
        # sqrt form (not Java hypot): bit-identical to PostGIS ST_Distance
        # and to the DuckDB oracle's formula
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))))
    return cand.filter(F.col("distance") <= F.col("__g")).drop("__g")


# first-pass kNN parameters: guarantee radius (meters) and the fine grid
# resolution used for it (res 21 -> ~19 m cells). Dense mega-cells are the
# reason these exist: within a 150 m radius a dense city cell can genuinely
# hold thousands of in-radius houses per query (measured 40M candidate pairs
# at bench sf0.25), but only the top-`limit` survive — the first pass bounds
# the fan-out to the ~nearest houses and provably satisfies most queries.
G1_METERS = 32.0
G1_RES = 21


def _reverse_osm(spark, tables: GeocoderTables, q: DataFrame) -> DataFrame:
    # SKINNY candidate rows through every shuffle: only join/rank columns
    # (id, x, y, street_id, distance, ...) travel through the windows;
    # street/city display attributes are joined back AFTER the final top-k
    # (the street_city join is key-preserving — street_id is its key — so a
    # pre-rank LEFT SEMI is count-equivalent to the reference's inner join
    # and the decorate-after-top-k rewrite is exact). Measured: the fat rows
    # spilled 7.7 GB through the round-1 window at bench sf1.0.
    houses_slim = tables.houses.select("id", "house_number", "x", "y",
                                       "street_id", "ix", "iy")
    street_keys = tables.street_city.select("street_id")

    # --- round 1: fine-grid probe within g1 = min(G1_METERS, radius) -------
    # complete-by-construction for distance <= g1, so a query whose round-1
    # street-joined candidate count reaches `limit` (or whose radius was
    # fully covered) needs no second round: the true top-`limit` rows are
    # all within g1. Counting AFTER the street (semi-)join matters — a
    # dangling street_id row must not count toward satisfaction.
    c1 = _candidates(
        q.withColumn("__r1", F.least(F.lit(G1_METERS), F.col("radius"))),
        houses_slim, radius_col="__r1", res=G1_RES,
    ).drop("__r1").join(F.broadcast(street_keys), "street_id", "left_semi")
    # ONE shuffle by query_id computes both the satisfaction count and the
    # per-query rank; kept rows are truncated to `limit` right here (their
    # ordering within a satisfied query is final — see pre-rank argument
    # below), so the union the tail re-ranks is tiny
    _p = Window.partitionBy("query_id")
    c1 = (c1.withColumn("__n1", F.count("*").over(_p))
            .withColumn("__r1rn", F.row_number().over(
                _p.orderBy(F.col("distance").asc(), F.col("id").asc()))))
    c1_keep = c1.filter(
        ((F.col("__n1") >= F.col("limit")) | (F.col("radius") <= F.lit(G1_METERS)))
        & (F.col("__r1rn") <= F.col("limit"))
    ).drop("__n1", "__r1rn")

    # --- round 2: full radius on the res-18 grid, only for queries round 1
    # could not complete (the two c1 consumers share one shuffle via
    # ReuseExchange)
    sat_ids = c1.filter(F.col("__n1") >= F.col("limit")).select("query_id").distinct()
    q2 = q.filter(F.col("radius") > F.lit(G1_METERS)).join(sat_ids, "query_id", "left_anti")
    c2 = _candidates(q2, houses_slim) \
        .join(F.broadcast(street_keys), "street_id", "left_semi")

    cand = c1_keep.unionByName(c2)
    # pre-rank to `limit` houses per query before the PIP join (duplication
    # by overlapping admin polygons never promotes a lower-ranked house, so
    # results are identical — see forward.py for the argument)
    pre_w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    cand = cand.withColumn("__pre", F.row_number().over(pre_w)) \
        .filter(F.col("__pre") <= F.col("limit")).drop("__pre")
    cand = _admin_cols(spark, tables, cand)
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(),  # 004:88 ORDER BY ST_Distance
        F.col("id").asc(), F.col("a4_name").asc_nulls_last(), F.col("a6_name").asc_nulls_last(),
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("limit"))
        # decorate the surviving top-k with street/city display attributes
        .join(F.broadcast(tables.street_city.select(
            "street_id", "road", "city_name", "postcode")), "street_id", "inner")
        .select(
            "query_id",
            F.lit(None).cast("string").alias("house"),
            F.col("road"),
            F.col("house_number"),
            F.col("postcode"),
            F.col("city_name").alias("city"),  # 004:73 — no NULLIF here
            F.nullif(F.col("a6_name"), F.lit("")).alias("county"),
            F.nullif(F.col("a4_name"), F.lit("")).alias("state"),
            "x", "y", "distance",
            F.lit(ZERO_UUID).alias("license_id"),
        )
    )


def _reverse_oa(spark, tables: GeocoderTables, q: DataFrame) -> DataFrame:
    """point_to_address_oa (004:30-49): oa_house⋈oa_street⋈oa_city, no admin
    joins, license_id from the city row."""
    oa = tables.oa
    houses = oa["oa_house"]
    dim = (
        oa["oa_street"].select(F.col("id").alias("street_id"), F.col("street").alias("road"),
                               F.col("city_id"))
        .join(F.broadcast(oa["oa_city"].select(F.col("id").alias("__cid"), F.col("city"),
                                               F.col("postcode"), F.col("license_id"))),
              F.col("city_id") == F.col("__cid"), "inner").drop("__cid")
    )
    cand = _candidates(q, houses).join(F.broadcast(dim), "street_id", "inner")
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("limit"))
        .select(
            "query_id",
            F.col("name").alias("house"),
            F.col("road"), F.col("housenumber").alias("house_number"),
            F.col("postcode"), F.col("city"),
            F.lit(None).cast("string").alias("county"),
            F.lit(None).cast("string").alias("state"),
            "x", "y", "distance", "license_id",
        )
    )
