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
from .etl import HOUSE_CELL_RES
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


def _grid_expand(q: DataFrame, res: int = HOUSE_CELL_RES) -> DataFrame:
    """k-ring expansion as pure JVM expressions: one row per (ix, iy) grid
    cell covering [qx±radius, qy±radius] (usually ≤4 rows per query —
    sequence + two explodes, fully inside whole-stage codegen)."""
    from .etl import grid_cols

    x0, y0 = grid_cols(F.col("qx") - F.col("radius"), F.col("qy") - F.col("radius"), res)
    x1, y1 = grid_cols(F.col("qx") + F.col("radius"), F.col("qy") + F.col("radius"), res)
    return (q.withColumn("__ix0", x0).withColumn("__ix1", x1)
            .withColumn("__iy0", y0).withColumn("__iy1", y1)
            .withColumn("ix", F.explode(F.sequence(F.col("__ix0"), F.col("__ix1"))))
            .withColumn("iy", F.explode(F.sequence(F.col("__iy0"), F.col("__iy1"))))
            .drop("__ix0", "__ix1", "__iy0", "__iy1"))


def _admin_cols(spark, tables: GeocoderTables, df: DataFrame) -> DataFrame:
    """LEFT JOIN osm_admin a4/a6 ON ST_Contains (004:82-83): broadcast PIP,
    explode_outer preserves both left rows and overlap multiplicity."""
    df = df.withColumn("__a4", spatial.pip_match_col(spark, tables.prepared_admin(4), "x", "y"))
    df = df.withColumn("__a6", spatial.pip_match_col(spark, tables.prepared_admin(6), "x", "y"))
    df = df.withColumn("a4_name", F.explode_outer("__a4")).drop("__a4")
    df = df.withColumn("a6_name", F.explode_outer("__a6")).drop("__a6")
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

    osm = _reverse_osm(spark, tables, q)
    if not with_fallback or tables.oa is None:
        return osm.select(*RESULT_COLS)

    # J11 source fallback: OA only for queries with zero OSM rows
    # (osmgeocoder/reverse.py:52-63) — left-anti on the hit set
    hits = osm.select("query_id").distinct()
    q_missed = q.join(hits, "query_id", "left_anti")
    oa = _reverse_oa(spark, tables, q_missed)
    return osm.select(*RESULT_COLS).unionByName(oa.select(*RESULT_COLS))


def _candidates(q: DataFrame, houses: DataFrame) -> DataFrame:
    """grid expansion + equi-join + exact residual distance filter."""
    qc = _grid_expand(q)
    cand = houses.join(F.broadcast(qc), ["ix", "iy"], "inner")
    # 004:85-87 — the 1-D ST_X band prefilter, then exact ST_DWithin
    cand = cand.filter(
        (F.col("x") >= F.col("qx") - F.col("radius"))
        & (F.col("x") <= F.col("qx") + F.col("radius"))
    ).withColumn("distance", F.sqrt(
        # sqrt form (not Java hypot): bit-identical to PostGIS ST_Distance
        # and to the DuckDB oracle's formula
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))))
    return cand.filter(F.col("distance") <= F.col("radius"))


def _reverse_osm(spark, tables: GeocoderTables, q: DataFrame) -> DataFrame:
    cand = _candidates(q, tables.houses)
    cand = cand.join(F.broadcast(tables.street_city), "street_id", "inner")
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
