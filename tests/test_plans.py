"""Physical-plan discipline: the properties that make these queries survive
a 100x scale-up must be visible in the EXECUTED plan, not just intended —
predicate pushdown reaches the parquet scan, projection prunes columns,
and no pair-generating operator degenerates to a nested-loop/cartesian."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_filter_pushed_to_scan(spark):
    from geospark import entry_queries as eq

    plan = _plan(eq.QUERIES["tpch_pricing"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_doc_tokens_prunes_columns(spark):
    from geospark import entry_queries as eq

    plan = _plan(eq.QUERIES["doc_tokens"](spark, SF_DIR))
    # the scan must read only (doc_id, text), not the whole documents schema
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "url" not in read


def test_whole_stage_codegen_covers_scan_paths(spark):
    from geospark import entry_queries as eq

    plan = _plan(eq.QUERIES["doc_quality"](spark, SF_DIR))
    # '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert "*(1)" in plan and "ColumnarToRow" in plan


def test_dedup_pair_generators_have_no_nested_loops(spark):
    from geospark import dedup, simsearch

    docs = spark.createDataFrame(
        [(i, f"some words number {i} appear here repeatedly") for i in range(50)],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [float(j + i) for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<double>")
    # (minhash_lsh_pairs checkpoints its result eagerly, so its join plan is
    # not inspectable post-hoc; its banding shares the shape asserted here)
    for df in (
        dedup.simhash_pairs(docs, max_hamming=3),
        simsearch.embedding_dup_pairs(emb, threshold=0.9),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_raster_plans_stay_jvm_and_narrow(spark, geo):
    """rasterize/pool/vectorize must be pure-JVM plans (no Arrow/Python
    eval — the grid keys and ring geometry are closed-form columns) with
    hash aggregation (map-side combine), and zonal_stats must not
    degenerate to a cartesian."""
    from geospark import raster

    h = geo["struct"]["struct_house"]
    r = raster.rasterize(h, 15)
    p = _plan(r)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "HashAggregate" in p

    p13 = _plan(raster.pool(r, steps=2, res=15))
    assert "ArrowEvalPython" not in p13 and "HashAggregate" in p13

    pv = _plan(raster.vectorize(r, 15, F.col("n") >= 5))
    assert "ArrowEvalPython" not in pv and "BatchEvalPython" not in pv

    zones = geo["osm"]["osm_admin"].filter(F.col("admin_level") == 6)
    pz = _plan(raster.zonal_stats(spark, r, zones, 15))
    assert "CartesianProduct" not in pz


def test_geocode_join_paths_have_no_cartesian(spark, geo):
    from geospark.forward import forward_geocode
    from geospark.reverse import reverse_geocode

    fq = spark.createDataFrame(
        [(1, "Georgenstr", "34", None, "Amberg", None, None, None, 20000, 5)],
        "query_id long, road string, house_number string, postcode string, "
        "city string, country string, center_lat double, center_lon double, "
        "radius int, limit int")
    fpersists: list = []
    fplan = _plan(forward_geocode(spark, geo["tables"], fq, materialize=False,
                                  persist_registry=fpersists))
    assert "CartesianProduct" not in fplan
    for cached in fpersists:
        cached.unpersist()

    rq = spark.createDataFrame([(1, 47.9, 9.0, 150.0, 5)],
                               "query_id long, lat double, lon double, radius double, limit int")
    rplan = _plan(reverse_geocode(spark, geo["tables"], rq, with_fallback=False))
    assert "CartesianProduct" not in rplan


def test_expansion_splitter_stays_jvm(spark):
    """The abbreviation expansion + address splitter must compile to chained
    JVM regexp ops inside whole-stage codegen — no Python/Arrow stage for a
    per-query-row string rewrite (it runs on every unstructured query at
    corpus scale)."""
    from geospark.forward import split_address_cols

    q = spark.createDataFrame(
        [(1, "Hauptstr. 5, 95505 Dickenreuth")], "query_id long, search_term string")
    plan = _plan(split_address_cols(q))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "regexp_replace" in plan.lower()
