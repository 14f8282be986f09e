"""Measure the predict_text VALUE-SPACE rewrite at corpus scale (VERDICT r4
next-round #4): the r4 rewrite computes metaphone-code trigram similarity
once per (distinct query code) x (distinct wordlist code) and fans the
surviving code pairs back out to words through equi-joins, on the rationale
that |distinct codes| << |words| at corpus scale. That rationale was
asserted, not measured — at the 37-word bench toy scale the rewrite COSTS
~0.2 s (two extra fan-back joins). This script measures both shapes on a
~10^6-word synthetic wordlist (Zipfian counts, syllable-built words whose
metaphone collision rate mirrors real vocabulary: sound-alike spellings
share codes) and records |codes|/|words| + wall times.

Usage: python scripts/predict_scale.py [n_words] [cpus]
Writes BENCH/predict_scale.json; the SCALE.md table is maintained from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

BENCH_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


# r6: both shapes now SHIP in geospark.predict (the size dispatch of
# VERDICT r5 #6); this script measures the shipping code directly.
from geospark.predict import predict_text_per_word as per_word_predict  # noqa: E402
from geospark.predict import predict_text_value_space  # noqa: E402


def main():
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    load_at_launch = round(os.getloadavg()[0], 2)
    os.environ.setdefault("GEOSPARK_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from geospark.predict import prepare_wordlist
    from geospark.session import get_spark

    spark = get_spark("predict-scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # syllable-built vocabulary: sound-alike syllable spellings (maier/mayer/
    # meier, schmidt/schmitt/smith, ...) give the metaphone codes a REAL
    # collision profile instead of unique-code-per-word noise. Deterministic
    # id -> syllable arithmetic, all JVM-side.
    groups = [
        ["maier", "mayer", "meier", "meyer"],
        ["schmidt", "schmitt", "smith", "smid"],
        ["berg", "burg", "berk", "burgh"],
        ["stein", "stien", "sten"],
        ["bach", "bath", "back"],
        ["feld", "felt", "veld"],
        ["hof", "hoff", "hove"],
        ["dorf", "dorff", "thorp"],
        ["kirch", "church", "kirk"],
        ["muel", "muhl", "mill"],
        ["wald", "walt", "wold"],
        ["see", "sea", "zee"],
        ["neu", "new", "nue"],
        ["ober", "over", "obar"],
        ["unter", "under", "undar"],
        ["gross", "grosz", "groth"],
    ]
    flat = [s for g in groups for s in g]
    syl = F.array(*[F.lit(s) for s in flat])
    n = len(flat)
    ids = spark.range(0, int(n_words * 1.05), 1, int(cpus))

    # base-n digit decomposition of the id — injective up to n^4 ids, so the
    # draw count IS (approximately, minus rare cross-length string
    # collisions) the distinct-word count
    def digit(k):
        return syl[((F.col("id") / (n ** k)).cast("long")) % n]

    words = (
        ids.select(
            F.concat(
                digit(0), digit(1), digit(2),
                F.when((F.col("id") % 3) == 0, digit(3)).otherwise(F.lit("")))
            .alias("word"),
            (F.lit(1_000_000) / ((F.col("id") % 9973) + 1)).cast("long").alias("ct"))
        .groupBy("word").agg(F.max("ct").alias("ct")))
    wl = prepare_wordlist(words, parts=int(cpus)).cache()
    n_distinct_words = wl.count()
    n_codes = wl.select(F.explode(F.array("dmet", "dmet_alt")).alias("c")) \
        .filter("c <> ''").distinct().count()

    qs = [r.word for r in wl.select("word").orderBy(F.crc32("word")).limit(100).collect()]
    pq = spark.createDataFrame(
        [(i, w[: 4 + i % 5]) for i, w in enumerate(qs)],
        "query_id long, input string")

    def timed(fn, repeat=2):
        runs = []
        for _ in range(repeat):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        if max(runs) > 1.5 * min(runs):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        return runs

    # warm codegen/python workers on a slice before either variant
    predict_text_value_space(spark, wl.limit(1000), pq).count()
    value_rows = predict_text_value_space(spark, wl, pq).count()
    word_rows = per_word_predict(spark, wl, pq).count()
    assert value_rows == word_rows, (value_rows, word_rows)

    runs_value = timed(lambda: predict_text_value_space(spark, wl, pq).count())
    runs_word = timed(lambda: per_word_predict(spark, wl, pq).count())

    out = {
        "n_words": n_distinct_words,
        "n_distinct_codes": n_codes,
        "codes_per_word_ratio": round(n_codes / n_distinct_words, 4),
        "n_queries": pq.count(),
        "result_rows": value_rows,
        "value_space_runs_sec": runs_value,
        "per_word_runs_sec": runs_word,
        "value_space_min_sec": min(runs_value),
        "per_word_min_sec": min(runs_word),
        "speedup_value_over_per_word": round(min(runs_word) / min(runs_value), 3),
        "cpus": int(cpus),
        "load_at_launch": load_at_launch,
        "load_at_end": round(os.getloadavg()[0], 2),
    }
    with open(os.path.join(BENCH_ROOT, "predict_scale.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
