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
