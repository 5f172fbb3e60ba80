"""Similarity search over the ``embeddings`` table (``vec_id``,
``embedding: array<float>``, ``label``).

* **brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against all vectors; dot products via
  ``zip_with``+``aggregate`` (JVM-side, no Python); rank with a window.
  Output is (query_id, rank, neighbor_id) — integer-only, so the DuckDB
  oracle hashes identically (float scores stay internal).
* **label-blocked near-dup** — IVF-style: pairs compared only within a
  coarse partition (here the ``label`` column stands in for the coarse
  centroid assignment), turning O(n²) into Σ O(|cell|²).
* **LSH-bucketed ANN** — the scale path: random-hyperplane sign bits
  (deterministic planes derived from md5 of (plane, dim)) → bucket join;
  only same-bucket candidates are scored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, k: int = 5, n_queries: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for query vectors (vec_id < n_queries).

    The query side is tiny → ``broadcast``; the big side is scanned once,
    map-side scored, then a per-query window keeps k rows. Output
    ``(query_id, rank, neighbor_id)`` — deterministic tie-break on
    (score desc, neighbor_id asc)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.join(F.broadcast(q), on=emb["vec_id"] != q["query_id"])
        .withColumn("score", cosine(F.col("q_emb"), F.col("embedding")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "neighbor_id")
    )


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """IVF-style near-dup pairs: cosine ≥ threshold within a coarse cell
    (``label``). Output (vec_a, vec_b, cos_sim rounded 4)."""
    a = emb.select(F.col("label").alias("la"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("label").alias("lb"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, on=[a["la"] == b["lb"], a["vec_a"] < b["vec_b"]])
    return (
        pairs.withColumn("cos_sim", F.round(cosine(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def _plane_component(plane: int, dim) -> F.Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5-derived so planes are reproducible across runs and languages."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"plane{plane}:"), dim.cast("string"))), 1, 8), 16, 10)
    return (h.cast("double") / F.lit(float(0xFFFFFFFF))) - 0.5


def lsh_ann_topk(emb: DataFrame, k: int = 5, n_queries: int = 10, n_planes: int = 8) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket join, then exact
    scoring inside buckets only — the 100 TB path (bucket join instead of
    cross product; recall tunable by n_planes / multi-probe)."""
    dims = F.sequence(F.lit(0), F.size(F.col("embedding")) - 1)
    sig_bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    dims,
                    lambda x, i: x.cast("double") * _plane_component(p, i),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    bucket = F.concat_ws("", *[b.cast("string") for b in sig_bits])
    hashed = emb.withColumn("bucket", bucket)
    q = hashed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    cand = hashed.join(
        F.broadcast(q),
        on=[hashed["bucket"] == q["q_bucket"], hashed["vec_id"] != q["query_id"]],
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("score", cosine(F.col("q_emb"), F.col("embedding")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "neighbor_id")
    )


def ivf_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer (pyspark.ml,
    deterministic seed) assigns every vector to a cell; each query scores
    candidates only in its ``n_probe`` nearest cells — the classic
    inverted-file layout (Σ O(|cell|·q) instead of O(n·q)).

    At 100 TB the cell assignment is a write-once batch job (the cells
    become the table's partition key) and queries touch n_probe
    partitions; here both phases run inline.  Deterministic for a fixed
    seed; correctness is gated by a recall@k test against
    :func:`cosine_topk` (tests/test_functions.py) — k-means has no SQL
    twin, so this operator stays out of the driver-oracle contract.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = emb.withColumn("_features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="_cell").fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "_cell")

    # centroids as a tiny broadcast table: (cell, centroid array)
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )

    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # per query: the n_probe closest centroids (cells to scan)
    qc = q.join(F.broadcast(centroids))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cdist").asc(), F.col("cell").asc()
    )
    probes = (
        qc.withColumn(
            "_cdist",
            -cosine(F.col("q_emb"), F.col("centroid")),  # max cosine = min dist
        )
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "q_emb", "cell")
    )
    cand = assigned.join(
        F.broadcast(probes),
        on=[assigned["_cell"] == probes["cell"], assigned["vec_id"] != probes["query_id"]],
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("score", cosine(F.col("q_emb"), F.col("embedding")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "neighbor_id")
    )
