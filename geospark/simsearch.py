"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

  * brute-force cosine top-k — the exactness baseline; dot products via
    JVM-side higher-order functions (zip_with + aggregate: whole-stage
    codegen, no Python),
  * IVF-bucketed ANN — deterministic centroid seeding (first K vec_ids),
    assign every vector to its nearest centroid (one narrow pass against a
    broadcast centroid set), probe the top-P centroids per query, search
    only those buckets: the 100 TB path (brute force is O(Q*N); IVF is
    O(Q*N*P/K) with the same top-k contract when recall allows),
  * embedding cosine near-dup pairs (for dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors for each query vector.
    ``queries``: (query_id, embedding). Returns (query_id, vec_id, cosine,
    rank); ties broken by vec_id for determinism."""
    q = queries.select(F.col("query_id"), F.col("embedding").alias("q_emb"))
    pairs = q.crossJoin(emb.select("vec_id", "embedding"))
    scored = pairs.select(
        "query_id", "vec_id",
        F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(spark, emb: DataFrame, n_centroids: int = 8) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index: centroids = the first ``n_centroids`` vectors
    by vec_id (seeded, no k-means iterations — reproducibility beats cluster
    quality for the correctness contract; a k-means refiner can swap in
    without changing the query path). Returns (centroids, assigned)."""
    centroids = emb.orderBy("vec_id").limit(n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb"))
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("cos", cosine_col(F.col("embedding"), F.col("c_emb")))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("centroid_id").asc())))
        .filter("rn = 1")
        .select("vec_id", "embedding", "centroid_id")
    )
    return centroids, assigned


def assign_to_centroids(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest trained centroid per vector: argmax round(cosine, 6) with
    centroid_id tiebreak. Shared by ivf_train's loop and ivf_topk so the
    rounding + tiebreak the DuckDB oracle mirrors lives in ONE place.
    ``cent``: (centroid_id, c_emb). Returns (vec_id, embedding, centroid_id)."""
    return (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("cos", F.round(cosine_col(F.col("embedding"), F.col("c_emb")), 6))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("centroid_id").asc())))
        .filter("rn = 1")
        .select("vec_id", "embedding", "centroid_id")
    )


def ivf_train(spark, emb: DataFrame, n_centroids: int = 8,
              iters: int = 2) -> DataFrame:
    """Deterministic k-means refinement of the seeded IVF centroids:
    ``iters`` rounds of (assign to argmax rounded-cosine, recompute per-dim
    means). Reproducible ACROSS ENGINES, not just across runs:

      * assignment ranks round(cosine, 6) with centroid_id tiebreak — the
        dot/norm folds are sequential in both Spark (F.aggregate) and DuckDB
        (list_sum), so even the raw doubles agree;
      * centroid update sums round(v * 1e6) as exact integers (order-free),
        then divides — no float-summation-order nondeterminism — and rounds
        the result to 6 decimals;
      * clusters that lose all members drop out (documented semantics).

    Returns (centroid_id, c_emb array<double>)."""
    cent = emb.orderBy("vec_id").limit(n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb"))
    for _ in range(iters):
        assigned = assign_to_centroids(emb, cent).select("centroid_id", "embedding")
        cent = (
            assigned.select("centroid_id", F.posexplode("embedding").alias("dim", "v"))
            .withColumn("vq", F.round(F.col("v") * 1e6).cast("long"))
            .groupBy("centroid_id", "dim")
            .agg(F.sum("vq").alias("s"), F.count("*").alias("n"))
            .withColumn("c", F.round(F.col("s") / F.col("n") / 1e6, 6))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("ps"))
            .select("centroid_id", F.transform("ps", lambda s: s["c"]).alias("c_emb"))
        )
    return cent


def ivf_topk(spark, emb: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, n_probe: int = 2,
             centroids: DataFrame | None = None) -> DataFrame:
    """ANN top-k: probe the n_probe nearest centroids per query, search only
    their buckets. Same output shape as cosine_topk. ``centroids``: pass a
    trained set (ivf_train) to override the seeded assignment."""
    if centroids is not None:
        assigned = assign_to_centroids(emb, centroids)
    else:
        centroids, assigned = ivf_assign(spark, emb, n_centroids)
    q = queries.select("query_id", F.col("embedding").alias("q_emb"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("cos", cosine_col(F.col("q_emb"), F.col("c_emb")))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("centroid_id").asc())))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_emb", "centroid_id")
    )
    scored = (
        probes.join(assigned, "centroid_id")
        .select("query_id", "vec_id",
                F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dup_pairs_exact(emb: DataFrame, threshold: float = 0.92) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold, vec_a < vec_b —
    brute-force exact. O(N^2) crossJoin: the small-N recall baseline ONLY;
    the registered / scale path is ``embedding_dup_pairs`` (LSH-bucketed)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    return pairs.select(
        "vec_a", "vec_b",
        F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


SIGN_BANDS = 8
SIGN_BITS_PER_BAND = 8


def sign_band_cols(emb_col, bands: int = SIGN_BANDS,
                   bits_per_band: int = SIGN_BITS_PER_BAND) -> list:
    """Band columns of the sign-bit signature: band b packs the signs of
    dims [b*bits, (b+1)*bits) into an int (dim j -> bit j). Random-hyperplane
    LSH with the coordinate axes as hyperplanes — pure JVM expressions,
    reproduced verbatim by the DuckDB oracle. Out-of-range dims read as 0."""
    out = []
    for b in range(bands):
        bits = [
            F.when(F.get(emb_col, b * bits_per_band + j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits_per_band)
        ]
        v = bits[0]
        for x in bits[1:]:
            v = v + x
        out.append(F.concat_ws(":", F.lit(b), v.cast("long")))
    return out


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.92,
                        bands: int = SIGN_BANDS,
                        bits_per_band: int = SIGN_BITS_PER_BAND) -> DataFrame:
    """LSH-bucketed near-dup pairs: candidates = pairs sharing at least one
    sign-bit band (any equal band -> candidate), verified with the EXACT
    cosine >= threshold. Returns (vec_a, vec_b, cosine), vec_a < vec_b.

    Contract: this reports the banded candidate set's qualifying pairs, not
    all qualifying pairs — a pair whose signatures differ in every band is
    never materialized (that is the point: no crossJoin; the self-join
    shuffles on the band key only). Recall rises with threshold (near-
    identical vectors share most sign bits); for an exhaustive small-N sweep
    use ``embedding_dup_pairs_exact``."""
    banded = emb.select(
        "vec_id",
        F.explode(F.array(*sign_band_cols(F.col("embedding"), bands, bits_per_band))).alias("band"))
    cand = (
        banded.alias("l").join(banded.alias("r"),
                               (F.col("l.band") == F.col("r.band"))
                               & (F.col("l.vec_id") < F.col("r.vec_id")))
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
