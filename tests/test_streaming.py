"""Structured Streaming extensions: incremental geocode == batch geocode,
watermarked windowed aggregation."""

import os

from pyspark.sql import functions as F


def test_stream_geocode_matches_batch(spark, geo, tmp_path):
    from geospark import mine, streaming

    pages = spark.read.parquet("fixtures/webpages.parquet").limit(400).cache()
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    pages.write.parquet(in_dir)

    q = streaming.stream_geocode_pages(
        spark, geo["tables"], in_dir, out_dir, ckpt,
        schema=spark.read.parquet(in_dir).schema)
    q.awaitTermination(300)

    streamed = spark.read.parquet(out_dir).drop("batch_id")
    batch = mine.geocode_pages(spark, geo["tables"], pages)
    cols = sorted(batch.columns)
    a = sorted(map(tuple, streamed.select(cols).toPandas().astype(str).values.tolist()))
    b = sorted(map(tuple, batch.select(cols).toPandas().astype(str).values.tolist()))
    assert a == b and len(a) > 0


def test_stream_event_windows(spark, tmp_path):
    from geospark import streaming

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")
    ev.write.parquet(in_dir)
    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    agg = streaming.stream_event_windows(stream)
    q = (agg.writeStream.format("memory").queryName("evw")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination(300)
    got = spark.sql("select * from evw")
    # append mode emits only windows sealed by the watermark; compare those
    # against the batch equivalent
    batch = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"))
             .select(F.col("w.start").alias("window_start"), "event_type", "n"))
    got_map = {(r.window_start, r.event_type): r.n for r in got.collect()}
    batch_map = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert got_map  # some windows sealed
    for k, v in got_map.items():
        assert batch_map[k] == v


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    """First occurrence passes, replays in LATER micro-batches are dropped
    (state survives across restarts via the checkpoint)."""
    from geospark import streaming

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("docs", "out2", "ck2"))
    docs = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string")
    docs.write.parquet(in_dir)

    def run_once(run_id):
        stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)

        def sink(batch_df, batch_id):
            batch_df.withColumn("run_id", F.lit(run_id)) \
                .write.mode("append").parquet(out_dir)

        q = (streaming.stream_dedup_exact(stream)
             .writeStream.foreachBatch(sink)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination(300)

    run_once(1)
    seen1 = {r.text for r in spark.read.parquet(out_dir).filter("run_id = 1").collect()}
    assert seen1 == {"alpha text", "beta text"}

    # second batch: one replay (must be dropped via restored state), one new
    spark.createDataFrame([(4, "alpha text"), (5, "gamma text")],
                          "doc_id long, text string").write.mode("append").parquet(in_dir)
    run_once(2)
    seen2 = {r.text for r in spark.read.parquet(out_dir).filter("run_id = 2").collect()}
    assert seen2 == {"gamma text"}


def test_stream_dedup_windowed_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark variant: duplicates inside the horizon
    are dropped; the sha state is eviction-bounded by the watermark (here we
    assert the dedup semantics within one availableNow pass)."""
    from geospark import streaming

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("docsw", "outw", "ckw"))
    spark.createDataFrame(
        [(1, "alpha text", "2024-01-01 10:00:00"),
         (2, "alpha text", "2024-01-01 10:30:00"),   # dup within horizon
         (3, "beta text", "2024-01-01 11:00:00")],
        "doc_id long, text string, ts string").write.parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, text string, ts string").parquet(in_dir)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (streaming.stream_dedup_exact_windowed(stream, watermark="2 hours")
         .writeStream.foreachBatch(sink)
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination(300)
    out = spark.read.parquet(out_dir)
    assert {r.text for r in out.collect()} == {"alpha text", "beta text"}
    assert out.count() == 2


def test_stream_rasterize_matches_batch(spark, geo, tmp_path):
    """Streaming raster tiles == batch rasterize of the same points within
    one event-time window (exactly-once via availableNow + checkpoint)."""
    from geospark import raster, streaming

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("pts", "outr", "ckr"))
    pts = geo["struct"]["struct_house"].select("x", "y") \
        .withColumn("ts", F.lit("2024-01-01 10:15:00"))
    pts.write.parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema("x double, y double, ts string").parquet(in_dir)
        q = (streaming.stream_rasterize(stream, res=15)
             .writeStream.foreachBatch(
                 lambda df, _id: df.write.mode("append").parquet(out_dir))
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination(300)

    run_once()
    # append mode emits a window only once the watermark passes its end —
    # a later sentinel point advances the watermark and flushes the window
    spark.createDataFrame([(0.0, 0.0, "2024-01-02 12:00:00")],
                          "x double, y double, ts string") \
        .write.mode("append").parquet(in_dir)
    run_once()

    out = spark.read.parquet(out_dir).filter("window_start = '2024-01-01 10:00:00'")
    got = {(r.ix, r.iy): r.n for r in out.collect()}
    want = {(r.ix, r.iy): r.n
            for r in raster.rasterize(geo["struct"]["struct_house"], 15).collect()}
    assert got == want
    # cell ids carried by the stream match the batch op's Morton layout
    assert {r.cell_id for r in out.collect()} == \
           {r.cell_id for r in raster.rasterize(geo["struct"]["struct_house"], 15).collect()}


def test_stream_running_doc_counts_stateful(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches and restarts."""
    from geospark import streaming

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("docs2", "out3", "ck3"))
    spark.createDataFrame([("en", "hello"), ("en", "worlds"), ("de", "hallo")],
                          "lang string, text string").write.parquet(in_dir)

    def run_once(run_id):
        stream = spark.readStream.schema("lang string, text string").parquet(in_dir)

        def sink(batch_df, batch_id):
            batch_df.withColumn("run_id", F.lit(run_id)) \
                .write.mode("append").parquet(out_dir)

        q = (streaming.stream_running_doc_counts(stream)
             .writeStream.foreachBatch(sink)
             .outputMode("update").trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
        q.awaitTermination(300)

    run_once(1)
    got1 = {r.key: (r.n_docs, r.n_chars)
            for r in spark.read.parquet(out_dir).filter("run_id = 1").collect()}
    assert got1 == {"en": (2, 11), "de": (1, 5)}

    spark.createDataFrame([("en", "again")], "lang string, text string") \
        .write.mode("append").parquet(in_dir)
    run_once(2)
    got2 = {r.key: (r.n_docs, r.n_chars)
            for r in spark.read.parquet(out_dir).filter("run_id = 2").collect()}
    # state restored from checkpoint: en total rises to 3 docs / 16 chars
    assert got2 == {"en": (3, 16)}
