"""Resumable index build: commit ledger + per-partition lineage & metrics.

The reference makes indexing restartable through two-phase commits of the
segment manifest (``reference lucene/core/src/java/org/apache/lucene/index/
IndexWriter.java:3126-3164`` prepareCommit/commit of ``segments_N``) — a
crash loses at most the uncommitted in-memory DWPTs.  Our unit of commit is
the **index partition** ("run"): each partition's postings land in their own
parquet subdirectory, and a tiny ledger row records the partition's lineage
(input range, counts, wall time).  On restart, committed partitions are
skipped; only missing ones rebuild.  On Iceberg the same scheme rides on
snapshot ids (SURVEY §1.2 IndexReader-snapshot row); parquet directories keep
it storage-agnostic for local tests.

Layout under ``path/``:
    runs/part=<pid>/*.parquet      postings + doc rows of one partition
    ledger/*.parquet               one row per committed partition (lineage)
    stats/*.parquet                collection stats (written at finalize)
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .indexer import POSTINGS_COLUMNS, IndexConfig, InvertedIndex, build_index

_LEDGER_SCHEMA = (
    "partition_id int, n_docs bigint, n_postings bigint, n_blocks bigint, "
    "min_doc_id bigint, max_doc_id bigint, wall_s double, committed_at double"
)


def _ledger_path(path: str) -> str:
    return f"{path}/ledger"


def committed_partitions(spark: SparkSession, path: str) -> set[int]:
    """Partitions already committed in a previous (possibly crashed) build."""
    try:
        rows = spark.read.parquet(_ledger_path(path)).select("partition_id").collect()
        return {int(r["partition_id"]) for r in rows}
    except Exception:
        return set()


def build_partition(
    corpus: DataFrame, pid: int, n_partitions: int, config: IndexConfig, path: str
) -> dict:
    """Build + commit one index partition; returns its ledger row (lineage).

    The partition predicate is a doc_id *range* (same placement rule as
    ``build_index``'s repartitionByRange), so re-running with the same
    corpus/n_partitions always reproduces identical runs — the property that
    makes skip-on-restart sound.
    """
    spark = corpus.sparkSession
    id_col = config.id_col
    bounds = corpus.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    p_lo = lo + (span * pid) // n_partitions
    p_hi = lo + (span * (pid + 1)) // n_partitions
    part = corpus.filter((F.col(id_col) >= p_lo) & (F.col(id_col) < p_hi))

    t0 = time.monotonic()
    idx = build_index(part, IndexConfig(analyzer=config.analyzer, text_col=config.text_col, id_col=id_col, block_size=config.block_size, n_partitions=1))
    # run_id is partition-local inside build_index; offset by pid so runs stay
    # globally unique when the committed partitions are assembled
    raw = idx.postings.withColumn("run_id", F.col("run_id") + F.lit(pid * 1_000_000).cast("bigint")).select(
        *POSTINGS_COLUMNS
    )
    raw.write.mode("overwrite").parquet(f"{path}/runs/part={pid}/postings")
    idx.docs.write.mode("overwrite").parquet(f"{path}/runs/part={pid}/docs")
    wall = time.monotonic() - t0

    summary = idx.docs.agg(
        F.count("*").alias("nd"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("np"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    n_blocks = idx.postings.count()
    row = {
        "partition_id": pid,
        "n_docs": int(summary["nd"]),
        "n_postings": int(summary["np"]),
        "n_blocks": int(n_blocks),
        "min_doc_id": int(summary["lo"]) if summary["lo"] is not None else -1,
        "max_doc_id": int(summary["hi"]) if summary["hi"] is not None else -1,
        "wall_s": float(wall),
        "committed_at": time.time(),
    }
    # the ledger append IS the commit point (atomic per-partition)
    spark.createDataFrame([row], _LEDGER_SCHEMA).write.mode("append").parquet(_ledger_path(path))
    return row


def resumable_build(
    corpus: DataFrame,
    path: str,
    n_partitions: int,
    config: Optional[IndexConfig] = None,
) -> InvertedIndex:
    """Build (or resume building) a committed index at `path`.

    Restart-safe: partitions present in the ledger are skipped; interrupted
    partitions (written but not in the ledger) are rebuilt and overwritten.
    Returns the assembled index reading from the committed files.
    """
    config = config or IndexConfig()
    spark = corpus.sparkSession
    done = committed_partitions(spark, path)
    for pid in range(n_partitions):
        if pid in done:
            continue
        build_partition(corpus, pid, n_partitions, config, path)
    return open_index(spark, path, config)


def open_index(spark: SparkSession, path: str, config: Optional[IndexConfig] = None) -> InvertedIndex:
    """Open a committed resumable index (IndexReader-over-manifest analog)."""
    config = config or IndexConfig()
    postings = spark.read.option("basePath", f"{path}/runs").parquet(f"{path}/runs/part=*/postings")
    docs = spark.read.option("basePath", f"{path}/runs").parquet(f"{path}/runs/part=*/docs")
    postings = postings.select(*POSTINGS_COLUMNS)
    docs = docs.select("doc_id", "dl", "norm_byte")
    terms = postings.groupBy("term").agg(
        F.sum("count").cast("bigint").alias("df"), F.sum("sum_tf").cast("bigint").alias("ttf")
    )
    stats = docs.agg(
        F.count("*").alias("doc_count"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_ttf")
    ).collect()[0]
    return InvertedIndex(
        postings=postings,
        docs=docs,
        terms=terms,
        doc_count=int(stats["doc_count"]),
        sum_ttf=int(stats["sum_ttf"]),
        config=config,
    )


def read_ledger(spark: SparkSession, path: str) -> DataFrame:
    """Per-partition lineage & metrics table (north-rule observability)."""
    return spark.read.parquet(_ledger_path(path))
