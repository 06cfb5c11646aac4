#!/usr/bin/env python
"""spark-submit job: query a committed index from the command line.

The "switch from the reference" entry point: point it at an index written by
``run_index_build.py`` (or any ``InvertedIndex.write`` output) plus the
source corpus, give it a query in one of three syntaxes, get the top-k back
as JSON lines.

Cluster usage:

    spark-submit --py-files /tmp/lucene_solr_spark.zip scripts/run_search.py \
        --index <index path> --corpus <transcripts parquet/iceberg> \
        --query 'role AND (error OR fail*)' --syntax classic --k 10

Local smoke test:

    python scripts/run_search.py --generate 500 --query 'scan W merge' \
        --syntax surround

Syntaxes: ``classic`` (Lucene QueryParser grammar), ``simple``
(SimpleQueryParser), ``surround`` (W/N distance operators).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse(expr: str, syntax: str, analyzer):
    if syntax == "classic":
        from lucene_solr_spark.plans.parser import parse_query

        return parse_query(expr, analyzer)
    if syntax == "simple":
        from lucene_solr_spark.plans.simple_parser import SimpleQueryParser

        return SimpleQueryParser(analyzer).parse(expr)
    if syntax == "surround":
        from lucene_solr_spark.plans.surround_parser import parse_surround

        return parse_surround(expr)
    raise SystemExit(f"unknown syntax {syntax!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", help="path written by InvertedIndex.write")
    ap.add_argument("--corpus", help="transcripts parquet/iceberg path (stored fields)")
    ap.add_argument("--generate", type=int, default=0, help="local demo: build over N synthetic convs")
    ap.add_argument("--query", required=True)
    ap.add_argument("--syntax", default="classic", choices=["classic", "simple", "surround"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--fetch", default="text", help="comma-separated stored fields ('' = ids only)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucene_solr_spark.search").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.operators.indexer import IndexConfig, InvertedIndex, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    if args.generate:
        from lucene_solr_spark.sources.transcripts import transcripts_df_dist

        corpus = assign_doc_ids(
            transcripts_df_dist(spark, args.generate, n_partitions=8), ("conv_id", "turn_idx")
        ).persist()
        # positions on, so span/phrase/surround queries work in the demo
        index = build_index(corpus, IndexConfig(n_partitions=8, index_positions=True))
    else:
        if not args.index or not args.corpus:
            raise SystemExit("need --index and --corpus (or --generate N)")
        index = InvertedIndex.read(spark, args.index)
        corpus = assign_doc_ids(spark.read.parquet(args.corpus), ("conv_id", "turn_idx"))

    searcher = IndexSearcher(index, corpus)
    q = parse(args.query, args.syntax, index.config.analyzer)
    t0 = time.monotonic()
    top = searcher.search(q, args.k)
    cols = [c for c in args.fetch.split(",") if c]
    rows = searcher.fetch(top, columns=cols).collect() if cols else top.df.collect()
    dt = time.monotonic() - t0
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    print(
        json.dumps(
            {"query": args.query, "syntax": args.syntax, "hits_returned": len(rows), "sec": round(dt, 3)}
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
