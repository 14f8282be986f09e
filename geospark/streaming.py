"""Structured Streaming wrappers.

The reference is strictly batch (SURVEY.md §2.9: no watermarks/windows/state
anywhere), so these are engine EXTENSIONS, not parity items: the same
geocode-join pipeline running incrementally over arriving page files, and a
watermarked tumbling-window aggregation for event streams. Both use the
batch operators unchanged via foreachBatch — one code path for batch and
streaming (the Spark-idiomatic shape for this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_geocode_pages(spark, tables, input_dir: str, output_dir: str,
                         checkpoint_dir: str, schema=None, available_now: bool = True):
    """Incremental geocode-join: watch ``input_dir`` for page parquet files,
    geocode each micro-batch with the batch pipeline, append results to
    ``output_dir``. Exactly-once via the streaming checkpoint + append sink.

    Returns the StreamingQuery (await/stop is the caller's job)."""
    from .mine import geocode_pages

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    pages = reader.parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = geocode_pages(spark, tables, batch_df)
        out.withColumn("batch_id", F.lit(batch_id)) \
           .write.mode("append").parquet(output_dir)

    writer = pages.writeStream.foreachBatch(_process) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_exact(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup over a document stream: the FIRST occurrence of
    each text sha passes, any replay/duplicate in later micro-batches is
    dropped. Built-in stateful dropDuplicates — the seen-sha set lives in the
    streaming state store and survives restarts via the checkpoint (the
    streaming face of dedup.exact_dup_groups).

    STATE-GROWTH TRADEOFF: with no watermark the seen-sha store grows with
    the number of DISTINCT documents ever seen — exact global dedup over an
    unbounded corpus is inherently O(corpus) state (RocksDB-backed at scale).
    For long-running streams where duplicates only arrive within a bounded
    replay/ingest window, use ``stream_dedup_exact_windowed`` below: state is
    then bounded by the watermark horizon."""
    return docs.withColumn("text_sha", F.sha2("text", 256)).dropDuplicates(["text_sha"])


def stream_dedup_exact_windowed(docs: DataFrame, ts_col: str = "ts",
                                watermark: str = "24 hours") -> DataFrame:
    """Bounded-state variant: duplicates are only suppressed while their
    first occurrence is within the watermark horizon
    (dropDuplicatesWithinWatermark), so the state store evicts shas older
    than ``watermark`` instead of growing with corpus size. The right
    contract when duplicates come from bounded replay (crawler re-fetch,
    at-least-once upstream delivery), not from true corpus-wide repeats."""
    return (docs.withColumn("text_sha", F.sha2("text", 256))
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["text_sha"]))


def stream_running_doc_counts(docs: DataFrame, key_col: str = "lang") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): cumulative per-key
    document count + character volume across micro-batches. Each batch emits
    the UPDATED running totals for keys seen in that batch; state is
    (n_docs, n_chars) per key, checkpoint-persisted — the corpus-ingest
    progress tracker a training pipeline runs next to dedup."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, c = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            c += int(pdf["text"].str.len().fillna(0).sum())
        state.update((n, c))
        yield pd.DataFrame({"key": [key[0]], "n_docs": [n], "n_chars": [c]})

    return (
        docs.select(F.col(key_col).cast("string").alias("key"), "text")
        .groupBy("key")
        .applyInPandasWithState(update, "key string, n_docs long, n_chars long",
                                "n_docs long, n_chars long",
                                "update", GroupStateTimeout.NoTimeout)
    )


def stream_rasterize(points: DataFrame, res: int, ts_col: str = "ts",
                     window: str = "1 hour", watermark: str = "2 hours",
                     x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Streaming raster tiles: per (event-time window, grid cell) point
    counts over a point stream — the incremental face of raster.rasterize
    (live density tiles from a geocoded event feed). Watermarked windowed
    aggregation: late points beyond the watermark are dropped; state is
    bounded by (windows in watermark horizon) x (active cells). Emits
    (window_start, window_end, ix, iy, cell_id, n)."""
    from .etl import grid_cols, morton_cell_col

    gx, gy = grid_cols(F.col(x_col), F.col(y_col), res)
    return (
        points.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("ix", gx).withColumn("iy", gy)
        .groupBy(F.window(ts_col, window).alias("w"), "ix", "iy")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "ix", "iy",
                morton_cell_col(F.col("ix"), F.col("iy"), res).alias("cell_id"),
                "n")
    )


def stream_event_windows(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window per-type aggregation over a streaming
    events DataFrame (ts, event_type, value): late rows beyond the watermark
    are dropped; emits (window, event_type, n, value_sum)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → event time
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "value_sum")
    )
