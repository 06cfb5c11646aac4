#!/usr/bin/env python
"""spark-submit job: build (or resume) the committed inverted index.

Cluster usage (north rule: spark-submit --py-files on N / 4N executors):

    cd /root/repo && zip -qr /tmp/lucene_solr_spark.zip lucene_solr_spark
    spark-submit --py-files /tmp/lucene_solr_spark.zip \
        scripts/run_index_build.py \
        --input  <parquet/iceberg path of transcripts> \
        --output <index path> \
        --partitions 256

Local smoke test:

    python scripts/run_index_build.py --generate 2000 \
        --output /tmp/idx_demo --partitions 8

The job is restart-safe: committed partitions (per-partition ledger) are
skipped on re-submit; lineage/metrics land in <output>/ledger.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--generate", type=int, default=0, help="generate N synthetic conversations instead")
    ap.add_argument("--output", required=True, help="index output path")
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids
    from lucene_solr_spark.operators.lineage import read_ledger, resumable_build

    # on a cluster spark-submit supplies master/executors; default local[*].
    # Engine-critical configs are baked in so a bare spark-submit is correct:
    # Arrow batches capped at 4096 rows (bigger analysis batches cross the
    # glibc mmap threshold and collapse into page-fault churn under
    # concurrent workers — see lucene_solr_spark/session.py), AQE for
    # runtime skew handling.
    spark = (
        SparkSession.builder.appName("lucene_solr_spark-index-build")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.generate:
        from lucene_solr_spark.sources.transcripts import transcripts_df_dist

        raw = transcripts_df_dist(spark, args.generate, n_partitions=args.partitions)
    else:
        raw = spark.read.parquet(args.input)

    t0 = time.monotonic()
    corpus = assign_doc_ids(raw, ("conv_id", "turn_idx"), n_partitions=args.partitions)
    corpus = corpus.persist()
    idx = resumable_build(corpus, args.output, args.partitions, IndexConfig())
    wall = time.monotonic() - t0

    ledger = read_ledger(spark, args.output)
    n_parts = ledger.count()
    print(
        json.dumps(
            {
                "doc_count": idx.doc_count,
                "sum_ttf": idx.sum_ttf,
                "partitions_committed": n_parts,
                "wall_s": round(wall, 1),
                "turns_per_sec": round(idx.doc_count / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
