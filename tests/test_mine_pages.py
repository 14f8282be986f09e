"""Common-Crawl page-table ops: latest-snapshot dedup + per-domain stats."""

from datetime import datetime

from pyspark.sql import functions as F

from geospark import mine


def _pages(spark):
    rows = [
        ("https://a.example.org/p/1", datetime(2024, 1, 1, 10, 0), "old text"),
        ("https://a.example.org/p/1", datetime(2024, 1, 2, 10, 0), "new text"),
        ("https://a.example.org/p/2", datetime(2024, 1, 1, 9, 0), "only"),
        # exact-ts tie: content-hash tiebreak must pick deterministically
        ("https://B.example.org/p/3", datetime(2024, 1, 1, 8, 0), "zzz"),
        ("https://B.example.org/p/3", datetime(2024, 1, 1, 8, 0), "aaa"),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")


def test_latest_snapshot(spark):
    out = {r.url: r.text for r in mine.latest_snapshot(_pages(spark)).collect()}
    assert out["https://a.example.org/p/1"] == "new text"
    assert out["https://a.example.org/p/2"] == "only"
    assert len(out) == 3
    # tie resolved by sha256(text) ascending — stable across runs
    tie1 = out["https://B.example.org/p/3"]
    tie2 = {r.url: r.text for r in mine.latest_snapshot(_pages(spark)).collect()}[
        "https://B.example.org/p/3"]
    assert tie1 == tie2


def test_domain_stats(spark):
    out = {r.host: r for r in mine.domain_stats(_pages(spark)).collect()}
    # host is lower-cased before extraction
    assert set(out) == {"a.example.org", "b.example.org"}
    a = out["a.example.org"]
    assert a.n_pages == 3 and a.n_distinct_texts == 3
    assert a.text_chars == len("old text") + len("new text") + len("only")
    b = out["b.example.org"]
    assert b.n_pages == 2 and b.n_distinct_texts == 2
