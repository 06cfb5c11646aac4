"""Deterministic sampling operators for training-data pipelines.

No reference analog (task-brief surface); the sampling primitive reuses the
engine's partitioning-stable multiplicative id hash (the same deviation
documented on ``IndexSearcher.sampled_facet``): ``h = ((id % p) * K) % p``
with p = 100000007, K = 2654435761 — pure integer arithmetic, reproducible
under ANY partitioning and bit-exactly replayable in ANSI SQL, unlike
``DataFrame.sample`` whose Bernoulli draw depends on partition layout.

At 100 TB a sample is a pure Catalyst filter: no RNG state, no shuffle, and
predicate + column pruning still reach the scan underneath it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "sample_hash",
    "stratified_sample",
    "cap_per_stratum",
    "dsir_weights",
    "shard_assign",
    "temperature_mixture",
]

P = 100000007
K = 2654435761


def sample_hash(id_col: Column) -> Column:
    """The deterministic per-row hash; < ~2.7e17 intermediate, no overflow."""
    return ((id_col % F.lit(P)) * F.lit(K)) % F.lit(P)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    id_col: str = "doc_id",
    default_rate: Optional[int] = None,
) -> DataFrame:
    """Keep 1-in-``rates[stratum]`` rows per stratum (integer rates >= 1;
    rate 1 keeps everything). Strata missing from ``rates`` are dropped
    unless ``default_rate`` is given. Deterministic: the same row set comes
    back for any partitioning, executor count, or run."""
    if not rates and default_rate is None:
        raise ValueError("need at least one stratum rate")
    # `is not None`, not truthiness: default_rate=0 must hit the >= 1 check
    # below (Spark's `h % 0` yields NULL and would silently drop every
    # non-listed stratum instead of raising)
    for r in list(rates.values()) + ([default_rate] if default_rate is not None else []):
        if int(r) < 1:
            raise ValueError("rates must be >= 1")
    h = sample_hash(F.col(id_col))
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | ((F.col(strata_col) == stratum) & (h % F.lit(int(rate)) == 0))
    if default_rate is not None:
        others = ~F.col(strata_col).isin(list(rates))
        cond = cond | (others & (h % F.lit(int(default_rate)) == 0))
    return df.filter(cond)


def cap_per_stratum(df: DataFrame, strata_col: str, cap: int, id_col: str = "doc_id") -> DataFrame:
    """Keep at most ``cap`` rows per stratum (the per-domain/per-source cap
    of web-pipeline curation, e.g. RefinedWeb's per-host limits): the ``cap``
    rows with the smallest ``sample_hash(id)`` win, ties broken by id — a
    deterministic uniform draw without RNG state.

    Scale shape: one count aggregate splits strata into under-cap (kept
    verbatim — never sorted, never shuffled beyond the count) and over-cap
    (row_number window over only those strata's rows). On a web corpus the
    over-cap side is the few giant hosts, so the expensive sort touches a
    small fraction of rows; the count agg is map-side combinable.
    """
    if int(cap) < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql.window import Window

    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    # ONE count join, split by the carried count: at web scale the under-cap
    # stratum list is ≈ every distinct host (never broadcast-sized), so no
    # forced hint — AQE broadcasts the counts table when it fits
    tagged = df.join(counts, strata_col, "left")
    under = tagged.filter(F.col("_n") <= cap).drop("_n")
    # NULL-stratum rows never equi-join (_n null): they form one window
    # group on the over side and get capped together, as before
    over = tagged.filter((F.col("_n") > cap) | F.col("_n").isNull()).drop("_n")
    w = Window.partitionBy(strata_col).orderBy(sample_hash(F.col(id_col)).asc(), F.col(id_col).asc())
    capped = (
        over.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= cap).drop("_rn")
    )
    return under.unionByName(capped)


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    tau: float = 0.5,
    target_fraction: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture resampling: downsample so the surviving
    stratum distribution is proportional to ``n_s^tau`` — the multilingual /
    per-source temperature sampling of pretraining pipelines (mT5, XLM-R
    style), where ``tau < 1`` upweights small languages/sources relative to
    proportional sampling.

    With stratum sizes ``n_s`` and a target of ``target_fraction · N`` total
    survivors, the expected take from stratum s is ``T · n_s^tau / Σ n^tau``
    and its keep probability ``q_s = min(1, take_s / n_s)``.  The draw is the
    engine's deterministic multiplicative id hash against ``floor(q_s·10^6)``
    parts-per-million thresholds, so the sample reproduces under any
    partitioning and replays bit-exactly in SQL.

    Scale shape: ONE map-side-combinable ``groupBy(strata).count()`` collect
    (|strata| rows — the same driver footprint as a Lucene OrdinalMap), then
    for few strata the thresholds become literals in a pure Catalyst filter
    (zero exchanges, pruning reaches the scan); past 64 strata they ship as
    a broadcast threshold table instead, keeping the Catalyst expression
    flat for per-host corpora.  Determinism note: thresholds are computed
    driver-side in float64 with strata accumulated in sorted order, so the
    only floating sum (``Σ n^tau``) has a pinned order on both sides of the
    contract; ``tau=0.5`` uses IEEE-correctly-rounded sqrt.
    """
    import math

    if not 0.0 < float(target_fraction) <= 1.0:
        raise ValueError("target_fraction must be in (0, 1]")
    if float(tau) <= 0.0:
        raise ValueError("tau must be > 0")
    rows = df.groupBy(strata_col).count().collect()
    sizes = {r[strata_col]: int(r["count"]) for r in rows if r[strata_col] is not None}
    if not sizes:
        raise ValueError("no non-null strata to sample from")
    n_total = sum(sizes.values())
    weights = {
        s: (math.sqrt(float(n)) if float(tau) == 0.5 else float(n) ** float(tau))
        for s, n in sizes.items()
    }
    w_total = 0.0
    for s in sorted(weights):  # pinned accumulation order (see docstring)
        w_total += weights[s]
    target = float(target_fraction) * float(n_total)
    ppm = {
        s: int(math.floor(min(1.0, target * weights[s] / (w_total * sizes[s])) * 1_000_000))
        for s in sizes
    }
    h = sample_hash(F.col(id_col)) % F.lit(1_000_000)
    if len(ppm) <= 64:
        # few strata (languages, top-level sources): literal chained filter —
        # zero exchanges, pruning reaches the scan (BENCH/PLANS.md §9)
        cond = F.lit(False)
        for s, p in ppm.items():
            cond = cond | ((F.col(strata_col) == s) & (h < F.lit(p)))
        return df.filter(cond)
    # many strata (per-host corpora: millions of domains): a 10^6-deep Or
    # chain would blow up Catalyst — broadcast the (stratum, ppm) threshold
    # table instead; the semi-shaped inner join also drops unknown strata.
    # The threshold table carries the strata column's OWN type, and the
    # output re-selects df's columns so both paths return the same shape.
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = df.sparkSession
    th = spark.createDataFrame(
        list(ppm.items()),
        StructType(
            [
                StructField(strata_col, df.schema[strata_col].dataType),
                StructField("__tm_ppm", IntegerType()),
            ]
        ),
    )
    return (
        df.join(F.broadcast(th), strata_col)
        .filter(h < F.col("__tm_ppm"))
        .select(*df.columns)
    )


def shard_assign(
    df: DataFrame, shard_size: int, id_col: str = "doc_id", n_partitions: Optional[int] = None
) -> DataFrame:
    """Deterministic training-shard export: place every row in a seeded
    global permutation and cut the stream into fixed-size shards — the
    "globally shuffle, then write shard files" step that precedes training,
    made reproducible (no RNG state, no ``monotonically_increasing_id``).

    The permutation key is the engine's multiplicative id hash (ties by id),
    so the draw is uniform yet bit-replayable in SQL.  Rank comes from the
    ``assign_doc_ids`` two-pass partition-offset scheme: ONE range exchange
    on (hash, id), a tiny per-partition count collect, then each row gets
    ``base[partition] + local_index``.  No global window, no driver
    materialization — the shape is the index build's own, proven at
    0.8+ scaling efficiency.  Appends ``shard_id`` and ``shard_pos``
    (position within the shard); every shard except the last holds exactly
    ``shard_size`` rows.
    """
    if int(shard_size) < 1:
        raise ValueError("shard_size must be >= 1")
    shard_size = int(shard_size)
    n = n_partitions or df.rdd.getNumPartitions() or 8
    from .indexer import partition_offsets

    placed = (
        df.withColumn("_h", sample_hash(F.col(id_col)))
        .repartitionByRange(n, "_h", id_col)
        .sortWithinPartitions("_h", id_col)
        .persist()
    )
    bases = partition_offsets(placed)

    out_schema = ", ".join(
        f"`{f_.name}` {f_.dataType.simpleString()}" for f_ in df.schema.fields
    ) + ", shard_id bigint, shard_pos bigint"

    def add_shards(iterator):
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bases.get(pid, 0)
        seen = 0
        for pdf in iterator:
            ranks = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            out = pdf.drop(columns=["_h"])
            out["shard_id"] = ranks // shard_size
            out["shard_pos"] = ranks % shard_size
            yield out

    return placed.mapInPandas(add_shards, schema=out_schema)


_Q20 = 1 << 20  # the engine-wide 2^-20 fixed-point contract (lm.py, classify.py)


def dsir_weights(
    df: DataFrame,
    target_cond: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document by
    how target-like its hashed n-gram feature distribution is, so a
    pretraining corpus can be resampled toward a small curated target set.

    Features are unigrams + bigrams of the ``[a-z0-9]+`` token stream,
    hashed (poly31, the engine's oracle-replayable string hash) into
    ``n_buckets`` buckets. With bucket counts ``p_b`` over the target rows
    (``target_cond``) and ``q_b`` over ALL rows, each bucket's add-one
    log-likelihood ratio is quantized to the engine's order-free fixed
    point::

        lam_b = floor( float32( ln( ((p_b+1)/(Tp+B)) / ((q_b+1)/(Tq+B)) ) ) * 2^20 )

    and a document's weight is the exact integer sum of ``lam_b`` over its
    feature occurrences — ``weight_q / (n_feats * 2^20)`` is the average
    log importance ratio. Rows with zero features are omitted.

    Scale shape: two scans of the corpus, zero corpus-keyed shuffles beyond
    the final ``groupBy(id)``. Pass 1 aggregates feature occurrences into
    ``n_buckets`` partial-combined rows (both distributions in ONE groupBy);
    the ratio table is a broadcast join; pass 2 re-derives features and sums
    broadcast lambdas per document. Everything is built-in Catalyst
    (regexp_extract_all / transform / aggregate higher-order functions) —
    whole-stage codegen, no Python in the hot path.
    """
    from ..functions.hashing import P_MOD

    if int(n_buckets) < 2:
        raise ValueError("n_buckets must be >= 2")
    B = int(n_buckets)
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.expr("transform(sequence(1, size(_toks) - 1), i -> concat(_toks[i-1], ' ', _toks[i]))"),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    bucket = (
        F.expr(
            "aggregate(transform(sequence(1, length(_f)), i -> cast(ascii(substring(_f, i, 1)) as bigint)),"
            f" cast(0 as bigint), (a, c) -> (a * 31 + c) % {P_MOD})"
        )
        % F.lit(B)
    )

    def feature_buckets(frame: DataFrame, keep: list) -> DataFrame:
        # the doc text is dropped BEFORE the explode so each feature row
        # carries only (keep-cols, bucket), never a copy of the document
        feats = frame.withColumn("_toks", toks).select(
            *keep, F.explode(F.concat(F.col("_toks"), bigrams)).alias("_f")
        )
        return feats.withColumn("_b", bucket).drop("_f")

    fb = feature_buckets(
        df.select(F.col(id_col), target_cond.alias("_is_t"), F.col(text_col)), [id_col, "_is_t"]
    )
    counts = fb.groupBy("_b").agg(
        F.count("*").alias("_cq"),
        F.sum(F.when(F.col("_is_t"), F.lit(1)).otherwise(F.lit(0))).alias("_cp"),
    )
    totals = counts.agg(F.sum("_cq").alias("_tq"), F.sum("_cp").alias("_tp"))
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "_b",
        F.floor(
            F.log(
                ((F.col("_cp") + F.lit(1.0)) / (F.col("_tp") + F.lit(float(B))))
                / ((F.col("_cq") + F.lit(1.0)) / (F.col("_tq") + F.lit(float(B))))
            )
            .cast("float")
            .cast("double")
            * F.lit(float(_Q20))
        )
        .cast("long")
        .alias("_lam_q"),
    )
    scored = feature_buckets(df.select(F.col(id_col), F.col(text_col)), [id_col]).join(
        F.broadcast(lam), "_b"
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_feats"),
        F.sum("_lam_q").cast("bigint").alias("weight_q"),
    )
