"""Incremental (near-real-time) index maintenance via Structured Streaming.

The reference's NRT story: new documents land in fresh segments committed by
``IndexWriter``; readers reopen; ``TopicStream`` pulls micro-batches by
version checkpoint (``reference solr/solrj/src/java/org/apache/solr/client/
solrj/io/stream/TopicStream.java:71-85``, at-least-once).  The merge policy
then absorbs the small segments.

Spark-first translation (SURVEY §2.7 streaming note):

- ``readStream`` on the transcript source (file/Iceberg stream);
- ``foreachBatch``: each micro-batch is analyzed and flushed into new runs
  with the SAME partition-local build as the batch path (one task = one DWPT)
  and appended under ``index_path/runs/stream_batch=<id>/`` — an append-only
  commit, exactly-once through the checkpoint + idempotent overwrite of the
  batch directory (re-delivered batches rewrite the same path);
- doc_ids continue from the committed ``max_doc_id`` in stable
  ``(conv_id, turn_idx)`` order *within* the batch — global monotone across
  commits, matching Lucene's ingestion-order docIDs;
- the tiered merge policy (operators/merge.py) later absorbs the small
  streamed runs, the exact analog of NRT segment merging.

At cluster scale the source is an Iceberg snapshot stream / Kafka topic; the
foreachBatch body is unchanged.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.indexer import POSTINGS_COLUMNS, IndexConfig, InvertedIndex, build_index


def _committed_max_doc_id(spark: SparkSession, index_path: str) -> int:
    try:
        row = spark.read.parquet(f"{index_path}/runs/*/docs").agg(F.max("doc_id")).collect()[0]
        return int(row[0]) if row[0] is not None else -1
    except Exception:
        return -1


def index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    config: Optional[IndexConfig] = None,
    order_cols=("conv_id", "turn_idx"),
    n_partitions: int = 4,
) -> None:
    """foreachBatch body: flush one micro-batch into new committed runs."""
    config = config or IndexConfig()
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    base = _committed_max_doc_id(spark, index_path) + 1

    # stable in-batch ordering -> dense doc_ids continuing the committed range
    from ..operators.indexer import assign_doc_ids

    with_ids = assign_doc_ids(batch_df, order_cols, n_partitions=n_partitions).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(base)).cast("long")
    )
    idx = build_index(with_ids, IndexConfig(analyzer=config.analyzer, text_col=config.text_col, n_partitions=n_partitions))
    out = f"{index_path}/runs/stream_batch={batch_id}"
    # batch-scoped run ids: re-delivery overwrites the same directory (idempotent)
    postings = idx.postings.withColumn(
        "run_id", (F.col("run_id") + F.lit((batch_id + 1) * 10_000_000_000)).cast("bigint")
    ).select(*POSTINGS_COLUMNS)
    postings.write.mode("overwrite").parquet(f"{out}/postings")
    idx.docs.write.mode("overwrite").parquet(f"{out}/docs")
    with_ids.select("doc_id", config.text_col).write.mode("overwrite").parquet(f"{out}/stored")


def start_incremental_indexing(
    spark: SparkSession,
    source_path: str,
    index_path: str,
    checkpoint_path: str,
    schema,
    config: Optional[IndexConfig] = None,
    n_partitions: int = 4,
    available_now: bool = True,
):
    """Start the NRT indexing stream over a parquet source directory.

    ``available_now=True`` drains everything currently in the source and
    stops (test/backfill mode); ``False`` runs continuously (NRT mode).
    """
    stream = spark.readStream.schema(schema).parquet(source_path)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: index_batch(df, bid, index_path, config, n_partitions=n_partitions)
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def open_streamed_index(spark: SparkSession, index_path: str, config: Optional[IndexConfig] = None) -> InvertedIndex:
    """Open the union of all committed streamed runs as one queryable index."""
    config = config or IndexConfig()
    postings = spark.read.parquet(f"{index_path}/runs/*/postings").select(*POSTINGS_COLUMNS)
    docs = spark.read.parquet(f"{index_path}/runs/*/docs").select("doc_id", "dl", "norm_byte")
    terms = postings.groupBy("term").agg(
        F.sum("count").cast("bigint").alias("df"), F.sum("sum_tf").cast("bigint").alias("ttf")
    )
    stats = docs.agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")).collect()[0]
    return InvertedIndex(
        postings=postings,
        docs=docs,
        terms=terms,
        doc_count=int(stats["n"]),
        sum_ttf=int(stats["s"]),
        config=config,
    )


def stored_corpus(spark: SparkSession, index_path: str) -> DataFrame:
    """The streamed stored-field table (doc_id, text) for fetch/phrase."""
    return spark.read.parquet(f"{index_path}/runs/*/stored")
