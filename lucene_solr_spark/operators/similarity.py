"""Similarity search over an embedding column (array<float>).

Three paths, all exact-integer so the DuckDB oracle reproduces ranks
bit-for-bit (no float-sum ordering hazards):

- **Brute-force top-k** (the baseline): embeddings are quantized per-element
  ``q_i = floor(1000 * float64(x_i))`` (elementwise — exact in both engines);
  similarity = integer dot product; rank = (dot desc, vec_id asc).  The plan
  is a broadcast of the (tiny) query set against the full corpus — one scan,
  no shuffle except the global top-k (TakeOrderedAndProject).
- **Multi-table hyperplane LSH** (the scale path): ``n_tables`` independent
  tables of ``n_planes`` deterministic pseudo-random ±1 hyperplanes
  (LCG-derived, literal arithmetic) map each vector to one bucket per table;
  candidates = vectors sharing the query's bucket in ANY table, reranked
  exactly.  Precision comes from planes-per-table (bucket occupancy ~
  n/2^n_planes), recall from OR-ing tables (miss probability decays
  geometrically in n_tables) — the standard Indyk–Motwani amplification; a
  single wide table has no recall story and a single narrow table goes
  quadratic, which is why both knobs exist.  Defaults (16 planes x 8 tables)
  are production-scale: candidates per query ~ 8·n/65536 ≈ n/8192 by
  construction, and each of the 8 bucket joins is an equi-shuffle keyed by
  (table, bucket).
- **IVF-flat with trained centroids**: ceil(sqrt(n)) centroids, initialized
  by a deterministic multiplicative-hash spread over the corpus and refined
  with two unrolled Lloyd rounds of integer-exact k-means (L2 assignment,
  elementwise floor-division centroid means) — fully replayable in ANSI SQL,
  no RNG state.  Queries probe their ``n_probe`` nearest lists and rerank
  exactly.  At 100 TB: the codebook (sqrt(n)·dim ints) broadcasts, each Lloyd
  round is one map pass + one (cent_id, pos)-keyed aggregation, and query
  cost is n_probe·n/k candidates per query.

The fake-random plane construction: sign(i, j) = +1 iff
``(1103515245*(i + 64*j) + 12345) mod 2^31 < 2^30`` with the GLOBAL plane
index ``j = table*n_planes + plane`` — the textbook LCG, reproducible in SQL.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

QUANT = 1000
N_PLANES = 16  # planes per LSH table (bucket occupancy ~ n / 2^N_PLANES)
N_TABLES = 8  # OR-ed tables (recall amplification)
LSH_MARGIN_BITS = 4  # auto-sizing: 2^planes >= 2^margin * n -> candidates/table <= n/2^margin
LSH_MAX_TABLES = 64  # auto-sizing cap on the OR fan-out


def lsh_params_for(
    n: int,
    target_cos: float = 0.99,
    recall_target: float = 0.9,
    margin_bits: int = LSH_MARGIN_BITS,
    max_tables: int = LSH_MAX_TABLES,
) -> tuple[int, int]:
    """Size (n_planes, n_tables) from the corpus count so the candidate join
    stays LINEAR in n at any scale, with recall restored through the table OR.

    Planes: ``P = max(N_PLANES, ceil(log2 n) + margin_bits)`` puts
    ``2^P >= 2^margin_bits · n`` buckets per table, so the expected
    within-bucket self-join volume is ``n²/2^P <= n/2^margin_bits`` — o(n²)
    with P growing with n, the scaling the fixed 2^16 default lacked (at
    n=10^9: P=34, candidates/table ≈ n/16).

    Tables: a pair at cosine ``c`` shares one table's bucket w.p.
    ``(1 − acos(c)/π)^P`` (random-hyperplane collision), so the miss
    probability over L OR-ed tables is ``(1 − p_table)^L``; L is the
    smallest count with miss ≤ 1 − recall_target, capped at ``max_tables``
    (the cap binds only when target_cos is far below near-dup territory —
    raise margin_bits' complement or pre-block by a trained codebook there,
    e.g. :func:`semdedup`).  Predicted recall is for the WORST pair exactly
    at target_cos; closer pairs collide strictly more often.
    """
    import math

    n = max(int(n), 2)
    p = max(N_PLANES, math.ceil(math.log2(n)) + int(margin_bits))
    theta = math.acos(min(max(float(target_cos), -1.0), 1.0))
    p_plane = max(1e-12, 1.0 - theta / math.pi)
    p_table = p_plane**p
    if p_table >= 1.0:
        return p, 1
    miss_budget = max(1e-12, 1.0 - float(recall_target))
    tables = math.ceil(math.log(miss_budget) / math.log(1.0 - p_table))
    return p, max(1, min(int(max_tables), tables))
LCG_A, LCG_C, LCG_M = 1103515245, 12345, 1 << 31


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``qvec array<bigint>``: elementwise floor(1000*x) quantization."""
    return df.withColumn(
        "qvec", F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * QUANT).cast("long"))
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v)


def _l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


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


def plane_matrix(dim: int, n_planes: int = N_PLANES, n_tables: int = 1) -> np.ndarray:
    """(n_tables*n_planes, dim) ±1 matrix from the LCG rule; row j is GLOBAL
    plane index j (= table*n_planes + plane), matching the SQL literal."""
    i = np.arange(dim)[None, :]
    j = np.arange(n_tables * n_planes)[:, None]
    return np.where((LCG_A * (i + 64 * j) + LCG_C) % LCG_M < (LCG_M >> 1), 1, -1).astype(np.int64)


def lsh_buckets(
    df: DataFrame, dim: int, n_planes: int = N_PLANES, n_tables: int = N_TABLES
) -> DataFrame:
    """(vec_id, tbl, bucket): one bucket per table; bit p of table t's bucket
    is 1 iff qvec · plane_(t*n_planes+p) >= 0 (integer exact).  One Arrow
    pass computes all tables' projections as a single (n, L*P) matmul."""
    planes = plane_matrix(dim, n_planes, n_tables)

    def bucketize(iterator):
        bit_of = np.tile(np.arange(n_planes, dtype=np.int64), n_tables)
        for pdf in iterator:
            if not len(pdf):
                continue
            qm = np.stack(pdf["qvec"].to_numpy())  # (n, dim) int64
            proj = qm @ planes.T  # (n, L*P)
            bits = (proj >= 0).astype(np.int64) << bit_of[None, :]
            # sum each table's P bit-positions -> (n, L) bucket ids
            buckets = bits.reshape(len(pdf), n_tables, n_planes).sum(axis=2)
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vec_ids, n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(vec_ids)),
                    "bucket": buckets.reshape(-1),
                }
            )

    from ..session import spread_partitions

    return spread_partitions(df.select("vec_id", "qvec")).mapInPandas(
        bucketize, schema="vec_id bigint, tbl int, bucket bigint"
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    min_dot: int,
    n_planes: int | None = None,
    n_tables: int | None = None,
    target_cos: float | None = None,
    recall_target: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same LSH bucket in ANY table
    AND quantized dot >= min_dot (vec_a < vec_b).

    The dedup variant of the ANN path: per-table candidates are bounded
    ~n²/2^n_planes and the OR over tables restores recall for genuinely-close
    pairs (a pair at cosine c collides in one table w.p. (1-acos(c)/π)^P and
    is missed by all L tables w.p. (1-that)^L).  The integer dot verify is
    exact.  At 100 TB this is the embedding-dedup plan: (tbl, bucket) is the
    shuffle key, verify map-side.

    By default (``n_planes=None``) the parameters are SIZED FROM THE CORPUS
    via :func:`lsh_params_for` — planes ≈ log2(n) + 4, tables from the
    recall budget at ``target_cos`` — so candidates/table stays ≤ n/16 at
    any n (the fixed 2^16-bucket default went quadratic past ~10^8 vectors).
    ``target_cos`` defaults to the caller's own threshold, ``min_dot`` read
    back on the unit-vector quantization scale (floor-1000 components →
    dot ≈ 10^6·cos), so the ≥ ``recall_target`` budget holds for EVERY pair
    the operator is asked to find, not just comfortable ones.  The one-time
    ``count()`` auto-sizing costs is a single columnless scan; pass both
    parameters explicitly to skip it.
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    if n_planes is None or n_tables is None:
        if target_cos is None:
            target_cos = min(0.999, max(0.3, float(min_dot) / 1_000_000.0))
        auto_p, auto_l = lsh_params_for(
            embeddings.count(), target_cos=target_cos, recall_target=recall_target
        )
        n_planes = auto_p if n_planes is None else int(n_planes)
        n_tables = auto_l if n_tables is None else int(n_tables)
    q = quantize(embeddings).select("vec_id", "qvec")
    bk = lsh_buckets(q, dim, n_planes, n_tables)
    withb = q.join(bk, "vec_id")
    a = withb.select(F.col("vec_id").alias("vec_a"), F.col("qvec").alias("qa"), "tbl", "bucket")
    b = withb.select(F.col("vec_id").alias("vec_b"), F.col("qvec").alias("qb"), "tbl", "bucket")
    # verify the dot MAP-SIDE, before the cross-table dedup: a pair that
    # collides in k tables recomputes the dot k times, but the distinct()
    # exchange then carries (id, id, dot) = 3 longs per row instead of two
    # full dim-int quantized vectors (~100x smaller at dim 1024), and the
    # min_dot filter lands before the shuffle too.  The dot is a pure
    # function of the pair, so distinct over (vec_a, vec_b, dot) is
    # row-identical to id-pair dedup + per-pair verify.
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", _dot(F.col("qa"), F.col("qb")).alias("dot"))
        .filter(F.col("dot") >= int(min_dot))
        .distinct()
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
) -> DataFrame:
    """Multi-table bucketed ANN: candidates share the query's bucket in any
    of the ``n_tables`` tables, exact rerank.

    Returns (query_id, rank, neighbor_id, dot).  The (tbl, bucket) equi-join
    replaces the brute-force cross product — this is the 100 TB plan shape
    (shuffle keyed by (tbl, bucket), ~n_tables/2^n_planes of the corpus per
    query, with table-OR recall amplification a single table cannot give).
    For corpora far beyond 2^N_PLANES vectors, pass parameters from
    :func:`lsh_params_for` (here per-QUERY cost is bucket occupancy
    n/2^n_planes per table, so the fixed default degrades gracefully rather
    than quadratically — the hard auto-sizing lives on the pair-join path,
    :func:`embedding_neardup_pairs`).
    """
    dim = len(embeddings.select("embedding").first()["embedding"])
    q = quantize(embeddings).select("vec_id", "qvec")
    bk = lsh_buckets(q, dim, n_planes, n_tables)
    # no persist: the bucketed corpus is read twice (tiny queries branch +
    # candidates branch) — two scans is the honest 100 TB plan, and a
    # persist here would leak executor storage for every caller that never
    # unpersists the returned lazy plan's inputs
    withb = q.join(bk, "vec_id")
    queries = withb.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec"), "tbl", "bucket"
    )
    cand = (
        withb.join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qvec", "q_qvec")
        .distinct()
    )
    scored = cand.select(
        "query_id", "neighbor_id", _dot(F.col("qvec"), F.col("q_qvec")).alias("dot")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


# ------------------------------------------------------------------ IVF
# deterministic multiplicative id hash (same constants as operators/sampling)
_HP, _HK = 100000007, 2654435761


def _floor_div(s, c):
    """Exact floor division for Spark Columns via nonnegative remainder:
    (s - ((s % c + c) % c)) is exactly divisible, so truncating DIV == floor
    division in both Spark and DuckDB."""
    r = (s % c + c) % c
    return ((s - r) / c).cast("long")


def _assign_nearest(q: DataFrame, cents: DataFrame) -> DataFrame:
    """``(vec_id, qvec, cent_id)``: nearest centroid per vector, ties to the
    lowest ``cent_id``.

    Implemented as a map-side-combinable ``min(struct(l2, cent_id))``: the
    broadcast crossJoin colocates each vector's k candidate rows inside one
    task, so the partial aggregate collapses them to ONE row per vector
    before the exchange — the shuffle carries n rows, never the n·k
    window-sort a ``row_number`` assignment would (struct min is
    lexicographic on (l2, cent_id), bit-identical to that window's rn=1)."""
    scored = q.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "qvec",
        F.struct(
            _l2(F.col("qvec"), F.col("cvec")).alias("l2"), F.col("cent_id").alias("cent_id")
        ).alias("_lc"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min("_lc").alias("_m"), F.first("qvec").alias("qvec"))
        .select("vec_id", "qvec", F.col("_m.cent_id").alias("cent_id"))
    )


def kmeans_centroids(q: DataFrame, k: int, n_rounds: int = 2) -> DataFrame:
    """Integer-exact deterministic k-means over quantized vectors
    ``(vec_id, qvec)`` → ``(cent_id, cvec)``.

    Init: the k corpus vectors with the smallest multiplicative id hash
    ``((vec_id % P)·K) % P`` (a deterministic spread across the corpus — no
    RNG state, reproducible under any partitioning, unlike sampled k-means||
    seeding).  Refinement: ``n_rounds`` Lloyd iterations with exact-integer
    L2 assignment (ties to the lowest cent_id) and elementwise floor-division
    centroid means; clusters that lose all members are dropped.  Every step
    is replayable in ANSI SQL — the DuckDB oracle runs the same two unrolled
    rounds.

    Scale shape: the codebook broadcasts (k·dim ints); one Lloyd round = one
    broadcast-join map pass + one aggregation keyed by (cent_id, pos) — the
    corpus never self-joins or shuffles by payload.
    """
    from pyspark.sql.window import Window

    h = ((F.col("vec_id") % _HP) * _HK) % _HP
    # distributed top-k by hash (TakeOrderedAndProject), THEN number the k
    # survivors — never a global row_number over the whole corpus
    seed = q.select("vec_id", "qvec", h.alias("_h")).orderBy("_h", "vec_id").limit(k)
    w_init = Window.orderBy(F.asc("_h"), F.asc("vec_id"))
    cents = seed.select(
        (F.row_number().over(w_init) - 1).cast("int").alias("cent_id"),
        F.col("qvec").alias("cvec"),
    )
    for _ in range(n_rounds):
        assigned = _assign_nearest(q, cents)
        elems = assigned.select("cent_id", F.posexplode("qvec").alias("pos", "val"))
        means = elems.groupBy("cent_id", "pos").agg(
            F.sum("val").alias("s"), F.count("*").alias("c")
        )
        cents = (
            means.select("cent_id", "pos", _floor_div(F.col("s"), F.col("c")).alias("elem"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "elem"))), lambda x: x["elem"]
                ).alias("cvec")
            )
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: Optional[int] = None,
    n_probe: int = 2,
    n_rounds: int = 2,
    centroids: Optional[list] = None,
) -> DataFrame:
    """IVF-flat ANN: coarse quantization to TRAINED centroids, probe the
    query's ``n_probe`` nearest lists (by exact L2), exact dot rerank inside.

    ``n_centroids`` defaults to ceil(sqrt(n)) — the standard IVF list count,
    so expected list length is sqrt(n) and query cost is n_probe·sqrt(n)
    candidates instead of n.  Centroids come from
    :func:`kmeans_centroids` (deterministic hash-spread init + integer Lloyd
    rounds), so the DuckDB oracle replays everything bit-for-bit.
    """
    import math

    spark = embeddings.sparkSession
    q = quantize(embeddings).select("vec_id", "qvec")
    if centroids is None:
        # train once, eagerly, and release the cache before returning: the
        # codebook is broadcast-sized by construction (≤ ~sqrt(n)·dim ints),
        # so materializing it to the driver cuts the whole k-means out of
        # the returned query plan — repeat callers pass `centroids` back in
        # to skip retraining entirely
        q = q.persist()
        if n_centroids is None:
            n_centroids = int(math.ceil(math.sqrt(q.count())))
        centroids = [
            (r["cent_id"], r["cvec"])
            for r in kmeans_centroids(q, n_centroids, n_rounds).collect()
        ]
        q.unpersist()
    cents = spark.createDataFrame(centroids, "cent_id int, cvec array<bigint>")

    from pyspark.sql.window import Window

    assigned = _assign_nearest(q, cents)
    # probe ranking needs top-n_probe lists for the HANDFUL of query vectors
    # only — filter first, then window over that tiny set (never rank the
    # whole corpus's centroid candidates)
    probe_scored = (
        q.filter(F.col("vec_id").isin([int(i) for i in query_ids]))
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "qvec", "cent_id", _l2(F.col("qvec"), F.col("cvec")).alias("l2"))
    )
    w_probe = Window.partitionBy("vec_id").orderBy(F.asc("l2"), F.asc("cent_id"))
    probes = (
        probe_scored.withColumn("rn", F.row_number().over(w_probe))
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


# ------------------------------------------------------------------ PQ
def _subvectors(q: DataFrame, m: int, dim: int) -> DataFrame:
    """``(vec_id, sub, qvec)``: the corpus split into ``m`` contiguous
    subspaces of ``dim // m`` components each (one posexplode pass)."""
    subd = dim // m
    slices = F.array(*[F.slice("qvec", s * subd + 1, subd) for s in range(m)])
    return q.select("vec_id", F.posexplode(slices).alias("sub", "qvec"))


def pq_codebooks(
    q: DataFrame, m: int = 4, dim: int = 64, ks: int = 16, n_rounds: int = 2
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): one ``ks``-entry k-means
    codebook per contiguous subspace, trained jointly → ``(sub, cent_id,
    cvec)``.

    Same deterministic recipe as :func:`kmeans_centroids` — hash-spread
    init, integer Lloyd rounds with exact L2 assignment (ties to the lowest
    ``cent_id``) and floor-division means — but GROUPED by subspace, so all
    ``m`` codebooks train in the same two corpus passes instead of ``m``
    separate jobs: one Lloyd round = one broadcast-join map pass + one
    aggregation keyed by ``(sub, cent_id, pos)``.  The init seeds are the
    ``ks`` corpus vectors with the smallest multiplicative id hash (the
    hash depends on ``vec_id`` only, so every subspace seeds from the same
    documents — replayable in ANSI SQL).

    Scale shape: the full codebook is ``m·ks`` rows (broadcast-sized by
    construction); the corpus never self-joins or shuffles by payload.
    """
    spark = q.sparkSession
    h = ((F.col("vec_id") % _HP) * _HK) % _HP
    # distributed top-ks by hash (TakeOrderedAndProject) — never a global sort
    seed = [
        (int(r["vec_id"]), i)
        for i, r in enumerate(
            q.select("vec_id", h.alias("_h")).orderBy("_h", "vec_id").limit(ks).collect()
        )
    ]
    seed_df = spark.createDataFrame(seed, "vec_id long, cent_id int")
    subs = _subvectors(q, m, dim)
    cents = subs.join(F.broadcast(seed_df), "vec_id").select(
        "sub", "cent_id", F.col("qvec").alias("cvec")
    )
    for _ in range(n_rounds):
        assigned = _assign_nearest_grouped(subs, cents)
        elems = assigned.select("sub", "cent_id", F.posexplode("qvec").alias("pos", "val"))
        means = elems.groupBy("sub", "cent_id", "pos").agg(
            F.sum("val").alias("s"), F.count("*").alias("c")
        )
        cents = (
            means.select("sub", "cent_id", "pos", _floor_div(F.col("s"), F.col("c")).alias("elem"))
            .groupBy("sub", "cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "elem"))), lambda x: x["elem"]
                ).alias("cvec")
            )
        )
    return cents


def _assign_nearest_grouped(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Per-subspace nearest codeword: ``(sub, vec_id, qvec, cent_id)``, ties
    to the lowest ``cent_id`` — the grouped twin of :func:`_assign_nearest`
    (same map-side-combinable min-struct shape, broadcast codebook join
    keyed by ``sub``)."""
    scored = subs.join(F.broadcast(cents), "sub").select(
        "sub",
        "vec_id",
        "qvec",
        F.struct(
            _l2(F.col("qvec"), F.col("cvec")).alias("l2"), F.col("cent_id").alias("cent_id")
        ).alias("_lc"),
    )
    return (
        scored.groupBy("sub", "vec_id")
        .agg(F.min("_lc").alias("_m"), F.first("qvec").alias("qvec"))
        .select("sub", "vec_id", "qvec", F.col("_m.cent_id").alias("cent_id"))
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 4,
    dim: int = 64,
    ks: int = 16,
    n_rounds: int = 2,
    refine: int = 4,
    codebooks: Optional[list] = None,
) -> DataFrame:
    """PQ ANN with asymmetric distance computation + exact re-rank (the
    FAISS ``IndexPQ`` / IVFADC-refine recipe, Jégou et al. 2011 §III):

    1. encode every corpus vector as ``m`` codewords (its nearest codebook
       entry per subspace);
    2. per query, build the ``m×ks`` lookup table of subspace dots
       ``dot(q_sub, codeword)`` and approximate ``dot(q, x) ≈ Σ_sub
       LUT[sub][code_sub(x)]`` — the scan touches only the code table
       (``m`` small ints per vector instead of ``dim``: the memory/IO
       argument that makes PQ the 100 TB candidate-generation path);
    3. exact-dot re-rank of the top ``k·refine`` ADC candidates (raw
       vectors fetched for that handful only).

    All arithmetic is integer-exact on the quantized vectors, so the DuckDB
    oracle replays training, encoding, ADC, and re-rank bit-for-bit.

    Scale shape: codebooks broadcast (``m·ks·(dim/m)`` ints); encoding is a
    broadcast join + map-side-combined min-struct (corpus never
    self-joins); the ADC aggregation is map-side combinable keyed
    ``(query_id, vec_id)``; re-rank joins raw vectors for ``k·refine`` ids
    per query only.
    """
    spark = embeddings.sparkSession
    q = quantize(embeddings).select("vec_id", "qvec")
    if codebooks is None:
        codebooks = [
            (r["sub"], r["cent_id"], r["cvec"])
            for r in pq_codebooks(q, m, dim, ks, n_rounds).collect()
        ]
    books = spark.createDataFrame(codebooks, "sub int, cent_id int, cvec array<bigint>")
    codes, lut = _pq_codes_and_lut(q, books, query_ids, m, dim)
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cent_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").alias("adc_dot"))
    )
    return _exact_rerank(q, _adc_top_candidates(adc, k * refine), query_ids, k)


def _pq_codes_and_lut(q: DataFrame, books: DataFrame, query_ids: list[int], m: int, dim: int):
    """Corpus code table ``(sub, vec_id, cent_id)`` + per-query subspace
    lookup table ``(query_id, sub, cent_id, pdot)`` — the LUT is
    ``|query_ids|·m·ks`` rows, broadcast-sized by construction."""
    codes = _assign_nearest_grouped(_subvectors(q, m, dim), books).select(
        "sub", "vec_id", "cent_id"
    )
    qsubs = _subvectors(q.filter(F.col("vec_id").isin([int(i) for i in query_ids])), m, dim)
    lut = qsubs.join(F.broadcast(books), "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "cent_id",
        _dot(F.col("qvec"), F.col("cvec")).alias("pdot"),
    )
    return codes, lut


def _adc_top_candidates(adc: DataFrame, limit: int) -> DataFrame:
    """Top-``limit`` ADC candidates per query (ties to the lowest vec_id)
    → ``(query_id, vec_id)``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("adc_dot"), F.asc("vec_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= limit)
        .select("query_id", "vec_id")
    )


def _exact_rerank(q: DataFrame, cand: DataFrame, query_ids: list[int], k: int) -> DataFrame:
    """Exact-dot re-rank of the broadcast-sized ``(query_id, vec_id)``
    candidate set → the standard ``(query_id, rank, neighbor_id, dot)``
    top-k frame (raw vectors fetched for the candidates only)."""
    from pyspark.sql.window import Window

    qvecs = q.filter(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    rer = (
        q.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qvec"), F.col("q_qvec")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: Optional[int] = None,
    n_probe: int = 2,
    m: int = 4,
    dim: int = 64,
    ks: int = 16,
    n_rounds: int = 2,
    refine: int = 4,
    centroids: Optional[list] = None,
    codebooks: Optional[list] = None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV, the FAISS ``IndexIVFPQ`` + refine
    recipe): coarse-quantize the corpus into trained IVF lists, scan ONLY
    the query's ``n_probe`` probed lists, approximate dots there via the
    PQ code table + per-query lookup table, then exact-dot re-rank the top
    ``k·refine``.

    Composition of :func:`ivf_topk` (coarse stage) and :func:`pq_topk`
    (compressed in-list scan): candidates per query drop from n to
    ~``n_probe·n/n_centroids``, and the scanned payload per candidate is
    ``m`` small ints, not the raw vector — the two multiplicative savings
    that make ANN work at 10^12 vectors.  Both codebooks train
    deterministically (hash-spread init + integer Lloyd rounds), so the
    DuckDB oracle replays coarse training, PQ training, encoding, ADC, and
    re-rank bit-for-bit.
    """
    import math

    spark = embeddings.sparkSession
    q = quantize(embeddings).select("vec_id", "qvec")
    # one persist spans BOTH trainings: coarse k-means and the PQ codebooks
    # each make several corpus passes, and an early unpersist would force the
    # second training to re-quantize from source every job
    training = centroids is None or codebooks is None
    if training:
        q = q.persist()
    if centroids is None:
        if n_centroids is None:
            n_centroids = int(math.ceil(math.sqrt(q.count())))
        centroids = [
            (r["cent_id"], r["cvec"]) for r in kmeans_centroids(q, n_centroids, n_rounds).collect()
        ]
    if codebooks is None:
        codebooks = [
            (r["sub"], r["cent_id"], r["cvec"])
            for r in pq_codebooks(q, m, dim, ks, n_rounds).collect()
        ]
    if training:
        q.unpersist()
    cents = spark.createDataFrame(centroids, "cent_id int, cvec array<bigint>")
    books = spark.createDataFrame(codebooks, "sub int, cent_id int, cvec array<bigint>")

    from pyspark.sql.window import Window

    # coarse stage (same shapes as ivf_topk): corpus -> list id; query -> probes
    assigned = _assign_nearest(q, cents).select("vec_id", F.col("cent_id").alias("list_id"))
    probe_scored = (
        q.filter(F.col("vec_id").isin([int(i) for i in query_ids]))
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cent_id", _l2(F.col("qvec"), F.col("cvec")).alias("l2"))
    )
    w_probe = Window.partitionBy("vec_id").orderBy(F.asc("l2"), F.asc("cent_id"))
    probes = (
        probe_scored.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("list_id"))
    )

    # PQ stage restricted to the probed lists — restrict FIRST (probed-list
    # members only), THEN look up: the LUT join and the ADC sum run over
    # candidates — n_probe·n/n_centroids rows per query — never the full
    # m·n code table
    codes, lut = _pq_codes_and_lut(q, books, query_ids, m, dim)
    in_list = assigned.join(F.broadcast(probes), "list_id").select("query_id", "vec_id")
    adc = (
        codes.join(in_list, "vec_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "sub", "cent_id"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").alias("adc_dot"))
    )
    return _exact_rerank(q, _adc_top_candidates(adc, k * refine), query_ids, k)


def semdedup(
    embeddings: DataFrame,
    threshold_dot: int,
    n_centroids: Optional[int] = None,
    n_rounds: int = 2,
    centroids: Optional[list] = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) semantic dedup.

    K-means-cluster the embedding space, then WITHIN each cluster mark a
    vector as a semantic duplicate if some same-cluster vector with a
    smaller ``vec_id`` has quantized dot >= ``threshold_dot`` (the paper
    keeps one representative per high-similarity group; keep-lowest-id is
    the deterministic variant, replayable in SQL).  Returns
    ``(vec_id, cent_id, is_dup)`` — integers only.

    Scale shape: clustering IS the blocking — the only self-join is within
    a cluster (equi-shuffle keyed by cent_id), so pair count is
    sum(cluster_size²) instead of n².  ``n_centroids`` controls cluster
    size: the demo default ceil(sqrt(n)) gives sqrt(n)-sized clusters; at
    production scale pick ``n_centroids ~ n / target_cluster_size`` (the
    paper uses 50k clusters on LAION) so the within-cluster work stays
    linear in n.  Training is :func:`kmeans_centroids` — deterministic,
    broadcast codebook, corpus never self-joins during assignment.
    """
    import math

    q = quantize(embeddings).select("vec_id", "qvec")
    if centroids is None:
        q = q.persist()
        if n_centroids is None:
            n_centroids = int(math.ceil(math.sqrt(q.count())))
        centroids = [
            (r["cent_id"], r["cvec"]) for r in kmeans_centroids(q, n_centroids, n_rounds).collect()
        ]
        q.unpersist()
    spark = embeddings.sparkSession
    cents = spark.createDataFrame(centroids, "cent_id int, cvec array<bigint>")

    assigned = _assign_nearest(q, cents)
    a = assigned.select(F.col("cent_id"), F.col("vec_id").alias("id_a"), F.col("qvec").alias("q_a"))
    b = assigned.select(F.col("cent_id"), F.col("vec_id").alias("id_b"), F.col("qvec").alias("q_b"))
    dups = (
        a.join(b, "cent_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_dot(F.col("q_a"), F.col("q_b")) >= int(threshold_dot))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return assigned.join(dups, "vec_id", "left").select(
        F.col("vec_id").cast("long"),
        F.col("cent_id").cast("long"),
        F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias("is_dup"),
    )
