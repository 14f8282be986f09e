"""Driver contract for the spark-graft builder (PySpark target).

``entry`` is the smoke flagship; ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 (and the training-data ops) with
DuckDB oracles where the semantics are ANSI-SQL-expressible. The registry
lives in geospark/entry_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: enrich the sf0.001 documents table with the engine's
    training-data ops (language id, quality score, fingerprint) and
    geocode-join any addresses/coordinates mined from the text against the
    fixture reference world — the full page->mine->geocode pipeline shape.
    """
    from geospark import entry_queries as eq
    from geospark import mine, textops

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = eq.geo_state(spark)

    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"), "text")
    matches = (
        mine.geocode_pages(spark, st["tables"], pages)
        .groupBy("url").agg(F.count("*").alias("n_geo_matches"))
    )
    enriched = (
        textops.quality_scores(docs)
        .join(textops.language_id(docs), "doc_id")
        .join(textops.fingerprints(docs), "doc_id")
        .withColumn("url", F.concat(F.lit("doc://"), F.col("doc_id")))
        .join(matches, "url", "left")
        .select("doc_id", "n_words", F.round("quality", 6).alias("quality"),
                "lang_pred", "fingerprint",
                F.coalesce("n_geo_matches", F.lit(0)).alias("n_geo_matches"))
    )
    return enriched


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geospark import entry_queries as eq
    return dict(eq.QUERIES)


def oracle_sql() -> dict[str, str]:
    from geospark import entry_queries as eq
    return dict(eq.ORACLES)
