"""Text prediction (autocompletion): sql/geocoder/002-text_prediction.sql.

For each query input, find wordlist words where ANY of the four double-
metaphone cross-combinations passes the pg_trgm ``%`` (002:14-19), with
prefix-levenshtein < 3 (002:10,22 — Postgres substr(word, 0, n+1) = first n
chars, §7.4.5), ranked dist ASC, ct DESC, length ASC, word ASC, LIMIT 10
(002:23-28 — a fully deterministic total order).

Spark-first shape: the metaphone-trigram GIN indexes (001:90-91) become an
exploded token table over the wordlist's metaphone codes; query codes explode
the same way; the ``%`` OR-of-4 is an equi-join on the trigram followed by a
per-(word, variant-pair) similarity filter and a semi-dedup. The final
levenshtein runs JVM-side via F.levenshtein (no Python in that filter).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from . import metaphone, text


def metaphone_cols(col):
    @F.pandas_udf(StructType([StructField("dmet", StringType()), StructField("dmet_alt", StringType())]))
    def _m(s: pd.Series) -> pd.DataFrame:
        vals = [metaphone.double_metaphone(v or "") for v in s]
        return pd.DataFrame(vals, columns=["dmet", "dmet_alt"])

    return _m(col)


def _code_tokens(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explode both metaphone codes into (key..., variant, code, n_trgm,
    trigram) token rows — trigram construction stays JVM-side
    (tables.trigram_tokens_col == text.trigrams, unit-enforced), so no
    Arrow stage runs per predict call."""
    from .tables import trigram_tokens_col

    both = df.select(
        *key_cols,
        F.explode(F.array(
            F.struct(F.lit("p").alias("variant"), F.col("dmet").alias("code")),
            F.struct(F.lit("a").alias("variant"), F.col("dmet_alt").alias("code")),
        )).alias("__v"),
    ).select(*key_cols, "__v.variant", "__v.code")
    both = both.withColumn("__t", trigram_tokens_col(F.col("code")))
    return both.select(*key_cols, "variant", F.size("__t").alias("n_trgm"),
                       F.explode("__t").alias("trigram"))


def prepare_wordlist(wordlist: DataFrame) -> DataFrame:
    """wordlist (word, ct) + metaphone codes — the engine's equivalent of the
    dmetaphone GIN indexes, materialized once at build time."""
    # compact to a few partitions: the wordlist is dimension-sized and every
    # predict call scans it — 32 near-empty partitions just add task churn
    return wordlist.repartition(4).withColumn("__m", metaphone_cols(F.col("word"))) \
        .select("word", "ct", F.col("__m.dmet").alias("dmet"), F.col("__m.dmet_alt").alias("dmet_alt"))


def predict_text(spark, wordlist_m: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """``queries``: (query_id, input). ``wordlist_m``: prepare_wordlist output.
    Returns (query_id, word, ct, dist) top-k per query."""
    q = queries.withColumn("__m", metaphone_cols(F.col("input"))) \
        .select("query_id", "input", F.col("__m.dmet").alias("dmet"), F.col("__m.dmet_alt").alias("dmet_alt"))

    w_tokens = _code_tokens(wordlist_m, ["word"]).withColumnRenamed("variant", "w_variant") \
        .withColumnRenamed("n_trgm", "w_n")
    q_tokens = _code_tokens(q, ["query_id"]).withColumnRenamed("variant", "q_variant") \
        .withColumnRenamed("n_trgm", "q_n")

    shared = (
        q_tokens.join(w_tokens, "trigram")
        .groupBy("query_id", "word", "q_variant", "w_variant", "q_n", "w_n")
        .agg(F.count("*").alias("shared"))
        .withColumn("sim", F.col("shared") / (F.col("q_n") + F.col("w_n") - F.col("shared")))
        .filter(F.col("sim") >= text.TRGM_SIM_THRESHOLD)
        .select("query_id", "word").distinct()  # OR of the 4 combos (002:14-19)
    )

    cand = (
        shared.join(F.broadcast(queries), "query_id")
        .join(wordlist_m.select("word", "ct"), "word")
        # prefix levenshtein < 3, JVM-side (002:10,22)
        .withColumn("dist", F.levenshtein(
            F.substring(F.col("word"), 1, F.length(F.col("input"))), F.col("input")))
        .filter(F.col("dist") < 3)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("ct").desc(), F.length("word").asc(), F.col("word").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "word", "ct", "dist")
    )
