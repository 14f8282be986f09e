"""OSM source-side semantics: the imposm3 mapping filters (SURVEY.md S1/S2).

The reference shells out to imposm3 with data/imposm_mapping.yml; the mapping
declaratively selects columns and filters raw OSM elements into the 5 tables
(imposm_mapping.yml:5-134). Re-expressed here as DataFrame select+filter over
a raw-elements table (osm_id, kind, tags_json, geometry columns):

  * osm_buildings:    polygons with any `building` tag (mapping :22-29)
  * osm_roads:        linestrings with a `highway` tag, REQUIRE a `name`,
                      REJECT area=yes (mapping :43-47)
  * osm_admin:        polygons with boundary=administrative + admin_level
                      (mapping :79-97)
  * osm_postal_code:  polygons with postal_code (mapping :98-110)
  * osm_house_number: points REQUIRING addr:housenumber (mapping :131-133)

Tags travel as a JSON string column so the same predicates are expressible in
the DuckDB oracle (json_extract_string) and stay JVM-side in Spark
(get_json_object) — declarative filters Catalyst can push into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tag(col_name: str):
    return F.get_json_object(F.col("tags_json"), f"$['{col_name}']")


def osm_buildings(raw: DataFrame) -> DataFrame:
    return (raw.filter((F.col("kind") == "polygon") & _tag("building").isNotNull())
            .select("osm_id",
                    F.coalesce(_tag("name"), F.lit("")).alias("name"),
                    _tag("building").alias("type"),
                    F.coalesce(_tag("addr:street"), F.lit("")).alias("street"),
                    F.coalesce(_tag("addr:housenumber"), F.lit("")).alias("house_number"),
                    "rings", "xmin", "ymin", "xmax", "ymax", "centroid_x", "centroid_y"))


def osm_roads(raw: DataFrame) -> DataFrame:
    # mapping :43-47: require name, reject area=yes
    return (raw.filter((F.col("kind") == "linestring")
                       & _tag("highway").isNotNull()
                       & _tag("name").isNotNull()
                       & (F.coalesce(_tag("area"), F.lit("no")) != "yes"))
            .select("osm_id", _tag("highway").alias("type"),
                    _tag("name").alias("street"),
                    F.lit("highway").alias("cls"),
                    "line", "x0", "y0", "x1", "y1"))


def osm_admin(raw: DataFrame) -> DataFrame:
    return (raw.filter((F.col("kind") == "polygon")
                       & (_tag("boundary") == "administrative")
                       & _tag("admin_level").isNotNull())
            .select("osm_id", _tag("name").alias("name"),
                    _tag("admin_level").cast("int").alias("admin_level"),
                    _tag("boundary").alias("type"),
                    "rings", "xmin", "ymin", "xmax", "ymax", "centroid_x", "centroid_y"))


def osm_postal_code(raw: DataFrame) -> DataFrame:
    return (raw.filter((F.col("kind") == "polygon") & _tag("postal_code").isNotNull())
            .select("osm_id", _tag("postal_code").alias("postcode"),
                    "rings", "xmin", "ymin", "xmax", "ymax", "centroid_x", "centroid_y"))


def osm_house_number(raw: DataFrame) -> DataFrame:
    # mapping :131-133: require addr:housenumber
    return (raw.filter((F.col("kind") == "point") & _tag("addr:housenumber").isNotNull())
            .select("osm_id",
                    F.coalesce(_tag("addr:city"), F.lit("")).alias("city"),
                    F.coalesce(_tag("addr:postcode"), F.lit("")).alias("postcode"),
                    F.coalesce(_tag("addr:street"), F.lit("")).alias("street"),
                    _tag("addr:housenumber").alias("house_number"),
                    "x", "y"))


def import_osm(raw: DataFrame) -> dict:
    """The imposm read+write equivalent: raw elements -> the 5 OSM tables."""
    return dict(
        osm_buildings=osm_buildings(raw),
        osm_roads=osm_roads(raw),
        osm_admin=osm_admin(raw),
        osm_postal_code=osm_postal_code(raw),
        osm_house_number=osm_house_number(raw),
    )
