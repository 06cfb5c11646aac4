"""Scalable exact global ranking — no single-partition window.

An un-partitioned ``Window.orderBy(...)`` moves the whole table into ONE
task (Spark warns "No Partition Defined for Window operation"), which is a
non-starter at 100 TB.  The reference engine never does this either: Solr's
export/stream sort (``solr/core/src/java/org/apache/solr/handler/export/
ExportWriter.java:72``) is a per-segment sort + k-way merge, and ordinals
(``ord()``/``rord()`` function queries, ``solr/core/src/java/org/apache/solr/
search/ValueSourceParser.java``) come from the per-segment sorted doc-values
dictionary + a global-ordinal offset map (``lucene/join/.../GlobalOrdinals
Query.java``).  We reproduce exactly that shape:

1. bucket rows by key range.  Boundaries are computed ONCE on the driver from
   a seeded sample and baked into the plan as a literal expression — NOT via
   ``repartitionByRange``, whose boundary sampling is re-seeded per action
   (RDD-id based), so two jobs over the same plan can disagree about which
   partition a row lands in, corrupting the offset arithmetic.  Equal keys
   share a bucket by construction.
2. a window *within each bucket* (parallel, spills locally);
3. a tiny per-bucket count collect (≤ #buckets rows — the "global ordinal
   map", same driver-side footprint as Lucene's ``OrdinalMap``) turned into
   additive offsets via a broadcast join.

All helpers are exact (identical results to the naive global window) at any
parallelism, verified by tests/test_ranks.py.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "__rank_bucket"
_SAMPLE_CAP = 65536  # driver-side sample rows for boundary estimation


def _bucket_expr(key: Column, boundaries: list) -> Column:
    """Bucket id = number of boundaries strictly below the key (ascending
    key order).  A literal, deterministic expression — same bucket for a row
    in every job that evaluates the plan."""
    if not boundaries:
        return F.lit(0)
    e: Column = F.lit(0)
    for b in boundaries:
        e = e + F.when(key > F.lit(b), 1).otherwise(0)
    return e


def _boundaries(df: DataFrame, key: Column, n: int) -> list:
    """n-1 ascending bucket boundaries from a seeded sample (deterministic)."""
    total = df.count()
    if total == 0 or n <= 1:
        return []
    frac = min(1.0, float(_SAMPLE_CAP) / float(total))
    sample = sorted(
        r["__k"] for r in df.select(key.alias("__k")).sample(False, frac, seed=42).collect()
        if r["__k"] is not None
    )
    if not sample:
        return []
    bounds, seen = [], set()
    for i in range(1, n):
        b = sample[min(len(sample) - 1, (i * len(sample)) // n)]
        if b not in seen:
            seen.add(b)
            bounds.append(b)
    return bounds


def _bucketed(df: DataFrame, key: Column, num_partitions: int | None) -> DataFrame:
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bounds = _boundaries(df, key, n)
    return df.withColumn(_PID, _bucket_expr(key, bounds)).repartition(
        max(1, len(bounds) + 1), F.col(_PID)
    )


def _offsets_df(counts: list[tuple[int, int]], spark, ascending: bool) -> DataFrame:
    """(bucket, count) → (bucket, offset) with offset = cumulative count of
    buckets that sort earlier in the requested direction.  Tiny (≤ #buckets
    rows) → broadcast join."""
    counts = sorted(counts, reverse=not ascending)
    rows, acc = [], 0
    for pid, c in counts:
        rows.append((int(pid), acc))
        acc += int(c)
    spark_df = spark.createDataFrame(rows, schema=f"{_PID} int, __rank_off long")
    return F.broadcast(spark_df)


def global_row_number(
    df: DataFrame,
    order: Column,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order)`` without collapsing
    to one partition.  ``order`` must be ``col.asc()`` or ``col.desc()`` on a
    single key column.  Tie order within equal keys is bucket-local (the same
    freedom the naive window has).  Adds column ``out``; drops internals."""
    key, ascending = _order_key(order)
    part = _bucketed(df, key, num_partitions)
    counts = [
        (r[_PID], r["c"]) for r in part.groupBy(_PID).agg(F.count("*").alias("c")).collect()
    ]
    offs = _offsets_df(counts, df.sparkSession, ascending)
    w = Window.partitionBy(_PID).orderBy(key.asc() if ascending else key.desc())
    return (
        part.withColumn("__local_rn", F.row_number().over(w))
        .join(offs, _PID)
        .withColumn(out, (F.col("__local_rn") + F.col("__rank_off")).cast("long"))
        .drop(_PID, "__local_rn", "__rank_off")
    )


def global_dense_rank(
    df: DataFrame,
    order: Column,
    key: Column,
    out: str = "ord",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global ``dense_rank() OVER (ORDER BY order)``.  Equal keys share
    a rank; because bucketing co-locates equal keys, per-bucket dense ranks +
    a distinct-count offset compose to the global dense rank — the
    per-segment-ordinal + OrdinalMap-offset scheme of GlobalOrdinalsQuery."""
    k, ascending = _order_key(order)
    part = _bucketed(df, k, num_partitions)
    counts = [
        (r[_PID], r["c"])
        for r in part.groupBy(_PID).agg(F.countDistinct(key).alias("c")).collect()
    ]
    offs = _offsets_df(counts, df.sparkSession, ascending)
    w = Window.partitionBy(_PID).orderBy(k.asc() if ascending else k.desc())
    return (
        part.withColumn("__local_dr", F.dense_rank().over(w))
        .join(offs, _PID)
        .withColumn(out, (F.col("__local_dr") + F.col("__rank_off")).cast("long"))
        .drop(_PID, "__local_dr", "__rank_off")
    )


def nearest_rank_values(
    df: DataFrame,
    col: str,
    ranks: dict,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact nearest-rank order statistics (PercentileAgg's contract, computed
    exactly): returns a 1-row DataFrame with, for each ``name → k`` in
    ``ranks``, the k-th smallest value of ``df[col]`` as column ``name``.
    A rank may also be a callable ``n -> k`` evaluated against the total row
    count — the count falls out of the bucket-count pass for free, so callers
    never need a separate ``df.count()`` job.

    Scalable shape: a value-histogram ``groupBy(col).count()`` (cardinality-
    bounded, map-side partial agg) → running counts via the bucketed
    row-number machinery over *distinct values only* → one filter per rank.
    The full table is never globally sorted or windowed.
    """
    # the histogram feeds 4 downstream jobs (boundary count, boundary sample,
    # bucket counts, the cumulative pass) — persist it once; it is the
    # distinct-value relation, orders of magnitude smaller than the input
    hist = df.groupBy(col).agg(F.count("*").alias("__cnt")).persist()
    part = _bucketed(hist, F.col(col), num_partitions)
    counts = [
        (r[_PID], r["s"]) for r in part.groupBy(_PID).agg(F.sum("__cnt").alias("s")).collect()
    ]
    total = int(sum(c for _, c in counts))
    ranks = {name: (k(total) if callable(k) else k) for name, k in ranks.items()}
    offs = _offsets_df(counts, df.sparkSession, ascending=True)
    w = Window.partitionBy(_PID).orderBy(F.col(col).asc())
    cum = (
        part.withColumn("__cum_local", F.sum("__cnt").over(w))
        .join(offs, _PID)
        .withColumn("__cum", F.col("__cum_local") + F.col("__rank_off"))
        .select(col, "__cnt", "__cum")
    )
    # value at rank k = first value whose cumulative count reaches k
    # = min value among rows with __cum >= k.  All ranks come out of ONE
    # aggregation pass over the cumulative histogram — a per-rank
    # filter + crossJoin chain would re-execute the histogram/window
    # pipeline once per rank.
    return cum.agg(
        *[F.min(F.when(F.col("__cum") >= k, F.col(col))).alias(name) for name, k in ranks.items()]
    )


def _order_key(order: Column) -> tuple[Column, bool]:
    """Split a ``col.asc()`` / ``col.desc()`` / bare column into
    (key column, ascending?)."""
    s = str(order)
    # Column str forms: "Column<'v ASC NULLS FIRST'>" / "Column<'v DESC NULLS LAST'>"
    ascending = " DESC" not in s
    # strip the sort-order wrapper back to the child expression
    name = s.split("'")[1].split(" ")[0] if "'" in s else s
    return F.col(name), ascending
