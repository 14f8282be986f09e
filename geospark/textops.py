"""Text-analysis operators for large-scale training-data pipelines, over the
``documents`` table (doc_id, text, lang, source, n_chars).

All four operators are pure Spark SQL expressions (whole-stage codegen, no
Python), each with an exactly-equivalent DuckDB oracle in __spark_entry__:

  * token counting      — whitespace tokens + a BPE-ish regex token count
  * quality scoring     — length/alpha-ratio/stopword-ratio/mean-word-length
  * language id         — stopword-hit argmax over a fixed per-language list
  * doc fingerprinting  — min-hash over rolling word 5-grams (md5-derived)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# small fixed stopword lists (deterministic; embedded in oracle SQL too)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
}

WORD_RE = "[a-z0-9]+"
# BPE-ish: letter runs, digit runs, or single punctuation marks
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _words(col):
    return F.regexp_extract_all(F.lower(col), F.lit(WORD_RE), F.lit(0))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), "\\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0))).alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_words, alpha_ratio, stop_ratio, mean_word_len,
    quality) — quality is a fixed linear blend, clamped to [0, 1]."""
    words = _words(F.col("text"))
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    d = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(words).alias("n_words"),
        (F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")) / F.greatest(F.length("text"), F.lit(1))
         ).alias("alpha_ratio"),
        (F.size(F.filter(words, lambda w: F.array_contains(en, w))) / F.greatest(F.size(words), F.lit(1))
         ).alias("stop_ratio"),
        (F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")) / F.greatest(F.size(words), F.lit(1))
         ).alias("mean_word_len"),
    )
    quality = (
        F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.col("alpha_ratio") * 0.3
        + F.least(F.col("stop_ratio") * F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return d.withColumn("quality", F.round(quality, 6))


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred) — stopword-hit argmax with alphabetical tiebreak;
    'und' (undetermined) when no stopword hits at all."""
    words = _words(F.col("text"))
    hits = {}
    for lang, sw in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in sw])
        hits[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    d = docs.select("doc_id", *[hits[k].alias(f"h_{k}") for k in sorted(STOPWORDS)])
    best = F.greatest(*[F.col(f"h_{k}") for k in sorted(STOPWORDS)])
    pred = F.when(best == 0, F.lit("und"))
    for k in sorted(STOPWORDS):  # alphabetical order = deterministic tiebreak
        pred = pred.when(F.col(f"h_{k}") == best, F.lit(k))
    return d.select("doc_id", pred.alias("lang_pred"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — rolling word 5-gram min-hash: the minimum
    md5 over the document's word 5-grams (whole-word-list hash when shorter
    than 5 words). A content-defined fingerprint that is stable under
    reordering-free edits far from the minimal gram."""
    words = _words(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 5, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, 5))),
    )
    return docs.select(
        "doc_id",
        F.when(F.size(words) >= 5, F.array_min(grams))
        .otherwise(F.md5(F.concat_ws(" ", words))).alias("fingerprint"),
    )
