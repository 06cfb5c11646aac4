"""Similarity search over an embedding column (array<float>).

Two paths, both exact-integer so the DuckDB oracle reproduces ranks
bit-for-bit (no float-sum ordering hazards):

- **Brute-force top-k** (the baseline): embeddings are quantized per-element
  ``q_i = floor(1000 * float64(x_i))`` (elementwise — exact in both engines);
  similarity = integer dot product; rank = (dot desc, vec_id asc).  The plan
  is a broadcast of the (tiny) query set against the full corpus — one scan,
  no shuffle except the global top-k (TakeOrderedAndProject).
- **Hyperplane LSH** (the scale path): 8 deterministic pseudo-random ±1
  hyperplanes (LCG-derived, literal arithmetic) map each vector to an 8-bit
  bucket; candidates = same-bucket vectors, reranked exactly.  At 100 TB the
  bucket is the partition key: each query touches ~n/256 of the corpus.

The fake-random plane construction: sign(i,j) = +1 iff
``(1103515245*(i + dim*j) + 12345) mod 2^31 < 2^30`` — the textbook LCG,
reproducible in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

QUANT = 1000
N_PLANES = 8
LCG_A, LCG_C, LCG_M = 1103515245, 12345, 1 << 31


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``qvec array<bigint>``: elementwise floor(1000*x) quantization."""
    return df.withColumn(
        "qvec", F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * QUANT).cast("long"))
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v)


def brute_force_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k by quantized inner product for each query vector.

    Returns (query_id, rank, neighbor_id, dot) — integers only.
    The query side is broadcast (it is k rows); Catalyst turns the pair scan
    into BroadcastNestedLoopJoin over one corpus pass.
    """
    q = quantize(embeddings).select("vec_id", "qvec")
    queries = q.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    pairs = q.crossJoin(F.broadcast(queries)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _dot(F.col("qvec"), F.col("q_qvec")).alias("dot")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def _plane_sign(i: int, j: int) -> int:
    return 1 if (LCG_A * (i + 64 * j) + LCG_C) % LCG_M < (LCG_M >> 1) else -1


def plane_matrix(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    """(n_planes, dim) ±1 matrix from the LCG rule (same literals as SQL)."""
    i = np.arange(dim)[None, :]
    j = np.arange(n_planes)[:, None]
    return np.where((LCG_A * (i + 64 * j) + LCG_C) % LCG_M < (LCG_M >> 1), 1, -1).astype(np.int64)


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = N_PLANES) -> DataFrame:
    """Add ``bucket int``: bit j = 1 iff qvec · plane_j >= 0 (integer exact)."""
    planes = plane_matrix(dim, n_planes)

    def bucketize(iterator):
        for pdf in iterator:
            qm = np.stack(pdf["qvec"].to_numpy())  # (n, dim) int64
            proj = qm @ planes.T  # (n, n_planes)
            bucket = ((proj >= 0).astype(np.int64) << np.arange(n_planes)[None, :]).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(dtype=np.int64), "bucket": bucket.astype(np.int32)})

    buckets = df.select("vec_id", "qvec").mapInPandas(bucketize, schema="vec_id bigint, bucket int")
    return df.join(buckets, "vec_id")


def embedding_neardup_pairs(embeddings: DataFrame, min_dot: int, n_planes: int = N_PLANES) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same LSH bucket AND quantized
    dot >= min_dot (vec_a < vec_b).

    The dedup variant of the ANN path: the bucket join bounds candidates to
    ~n²/2^planes; the integer dot verify is exact.  At 100 TB this is the
    embedding-dedup plan: bucket is the shuffle key, verify is map-side.
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    q = lsh_bucket(quantize(embeddings).select("vec_id", "qvec"), dim, n_planes)
    a = q.select(F.col("vec_id").alias("vec_a"), F.col("qvec").alias("qa"), "bucket")
    b = q.select(F.col("vec_id").alias("vec_b"), F.col("qvec").alias("qb"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        cand.select("vec_a", "vec_b", _dot(F.col("qa"), F.col("qb")).alias("dot"))
        .filter(F.col("dot") >= int(min_dot))
        .distinct()
    )


def ivf_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5, n_centroids: int = 8, n_probe: int = 2
) -> DataFrame:
    """IVF-flat ANN: coarse quantization to fixed centroids, probe the
    query's `n_probe` nearest lists, exact rerank inside them.

    Centroids are the first `n_centroids` corpus vectors (deterministic
    training stand-in; real pipelines plug k-means here — the plan shape is
    identical).  Assignment/probing use the same exact integer dot products,
    so the DuckDB oracle replays everything.
    """
    q = quantize(embeddings).select("vec_id", "qvec")
    cents = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("qvec").alias("cvec")
    )
    # assign every vector to its best centroid (broadcast the tiny codebook)
    scored_c = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "qvec", "cent_id", _dot(F.col("qvec"), F.col("cvec")).alias("cdot")
    )
    from pyspark.sql.window import Window

    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cent_id"))
    assigned = (
        scored_c.withColumn("rn", F.row_number().over(w_assign)).filter(F.col("rn") == 1).select("vec_id", "qvec", "cent_id")
    )
    # queries probe their n_probe closest centroids
    probes = (
        scored_c.filter(F.col("vec_id").isin([int(i) for i in query_ids]))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec"), "cent_id")
    )
    cand = assigned.join(F.broadcast(probes), "cent_id").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _dot(F.col("qvec"), F.col("q_qvec")).alias("dot")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def lsh_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5, n_planes: int = N_PLANES) -> DataFrame:
    """Bucketed ANN: candidates share the query's LSH bucket, exact rerank.

    Returns (query_id, rank, neighbor_id, dot).  The bucket equi-join replaces
    the brute-force cross product — this is the 100 TB plan shape (shuffle
    keyed by bucket, ~1/2^n_planes of the corpus per query).
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    q = lsh_bucket(quantize(embeddings).select("vec_id", "qvec"), dim, n_planes).persist()
    queries = q.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec"), "bucket"
    )
    cand = q.join(F.broadcast(queries), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _dot(F.col("qvec"), F.col("q_qvec")).alias("dot")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )
