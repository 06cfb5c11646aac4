#!/usr/bin/env python
"""Second-scale bench point: the same build + query workload at 1x and 10x.

The per-round bench (bench.py) runs at ~4M turns, where the ~0.3 s
local-mode job floor dominates warm query latencies.  This script builds
the SAME deterministic transcripts corpus at two sizes (default 4M and
40M turns — the sf1-equivalent point that still fits the 128 GiB sandbox),
runs an identical 10-query headline set against both indexes, and reports
raw runs plus the 10x/1x wall ratio per query — separating the job floor
from real per-posting query cost and evidencing that p95 grows
sub-linearly with corpus size.

Queries are positions-free (the north-rule build indexes DOCS_AND_FREQS):
term lookups across the df spectrum, AND/OR/minShouldMatch booleans, the
block-max pruned paths, a count, and a 64-query batch through
``batch_search`` (the offline-retrieval shape).

Usage: python scripts/bench_scale10x.py [n_convs_small] [n_convs_big] [runs]
Prints one JSON line and appends the "10x scale point" section of
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(spark, n_convs: int, path: str) -> None:
    from lucene_solr_spark.sources.transcripts import transcripts_df_dist

    if os.path.exists(path):
        if os.environ.get("SCALE10X_REUSE", "0") == "1":
            return  # deterministic corpus (seed fixed): same n_convs -> same data
        shutil.rmtree(path)
    transcripts_df_dist(spark, n_convs, n_partitions=256).write.mode(
        "overwrite"
    ).parquet(path)


def headline_queries(idx):
    """10 deterministic queries built from the index's own df spectrum so
    the workload is identical in SHAPE at any corpus size (same ranks, not
    same absolute terms)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.plans.query import BooleanQuery, TermQuery

    ranked = [
        r["term"]
        for r in idx.terms.orderBy(F.desc("df"), F.asc("term")).limit(20000).collect()
    ]
    head, mid, mid2, rare = (
        ranked[0],
        ranked[min(100, len(ranked) - 1)],
        ranked[min(200, len(ranked) - 1)],
        ranked[min(10000, len(ranked) - 1)],
    )
    return {
        "term_head": TermQuery(head),
        "term_mid": TermQuery(mid),
        "term_rare": TermQuery(rare),
        "bool_and": BooleanQuery.build(must=[TermQuery(head), TermQuery(mid)]),
        "bool_or3": BooleanQuery.build(
            should=[TermQuery(head), TermQuery(mid), TermQuery(mid2)]
        ),
        "bool_mm2": BooleanQuery.build(
            should=[TermQuery(head), TermQuery(mid), TermQuery(rare)],
            minimum_should_match=2,
        ),
        "and_rare": BooleanQuery.build(must=[TermQuery(mid), TermQuery(rare)]),
        "or_mid": BooleanQuery.build(should=[TermQuery(mid), TermQuery(mid2)]),
    }


def run_point(spark, path: str, runs: int) -> dict:
    from lucene_solr_spark.operators.indexer import (
        IndexConfig,
        build_index_sorted_source,
    )
    from lucene_solr_spark.operators.searcher import IndexSearcher

    # build (raw runs committed; min is the capability number, as in bench.py)
    build_runs = []
    idx = None
    for r in range(runs + 1):  # run 0 warms cache/JIT
        spark.catalog.clearCache()
        t0 = time.monotonic()
        idx = build_index_sorted_source(spark, path, IndexConfig(n_partitions=None))
        dt = time.monotonic() - t0
        if r > 0:
            build_runs.append(round(dt, 2))
        print(f"  build run{r}: {dt:.1f}s", file=sys.stderr)
    n_turns = idx.doc_count

    s = IndexSearcher(idx, None)
    qs = headline_queries(idx)
    q_raw: dict = {}
    for name, q in qs.items():
        walls = []
        for _ in range(runs + 1):
            t0 = time.monotonic()
            s.search(q, 10).df.collect()
            walls.append(round(time.monotonic() - t0, 3))
        q_raw[name] = walls[1:]  # drop the planning-cost run
    # pruned path, forced on (skip rates are the scale-transferable part)
    saved = s.prune_min_postings
    s.prune_min_postings = 1
    walls = []
    for _ in range(runs + 1):
        t0 = time.monotonic()
        s.search(next(iter(qs.values())), 10).df.collect()
        walls.append(round(time.monotonic() - t0, 3))
    q_raw["term_head_pruned"] = walls[1:]
    s.prune_min_postings = saved
    # 64-query batch (offline retrieval shape — one postings scan)
    batch = {f"b{i}": q for i, q in enumerate(list(qs.values()) * 8)}
    walls = []
    for _ in range(runs + 1):
        t0 = time.monotonic()
        s.batch_search(batch, 10).count()
        walls.append(round(time.monotonic() - t0, 3))
    q_raw["batch_64"] = walls[1:]

    # LM-Dirichlet kernel (the similarity SPI's second-most-used kernel):
    # pruning upper bounds are similarity-dependent, so pin that the pruned
    # paths stay sub-linear for a non-BM25 monotone kernel too
    from lucene_solr_spark.functions.similarities import LMDirichletSimilarity

    s_lmd = IndexSearcher(idx, None, similarity=LMDirichletSimilarity())
    for name, q in (("lmd_term_head", qs["term_head"]), ("lmd_or_mid", qs["or_mid"])):
        walls = []
        for _ in range(runs + 1):
            t0 = time.monotonic()
            s_lmd.search(q, 10).df.collect()
            walls.append(round(time.monotonic() - t0, 3))
        q_raw[name] = walls[1:]

    spark.catalog.clearCache()
    return {
        "n_turns": n_turns,
        "build_raw_runs_sec": build_runs,
        "build_turns_per_sec": round(n_turns / min(build_runs), 1),
        "queries_raw": q_raw,
        "queries_min": {k: min(v) for k, v in q_raw.items()},
    }


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000  # ~4M turns
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000  # ~40M turns
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    points = {}
    for tag, n_convs, path in (
        ("small", n_small, "/tmp/bench10x_small.parquet"),
        ("big", n_big, "/tmp/bench10x_big.parquet"),
    ):
        print(f"staging {tag}: {n_convs} convs", file=sys.stderr)
        stage(spark, n_convs, path)
        points[tag] = run_point(spark, path, runs)
        print(f"{tag}: {json.dumps(points[tag]['queries_min'])}", file=sys.stderr)

    scale = points["big"]["n_turns"] / points["small"]["n_turns"]
    ratios = {
        k: round(points["big"]["queries_min"][k] / max(points["small"]["queries_min"][k], 1e-9), 2)
        for k in points["small"]["queries_min"]
    }
    out = {
        "metric": "scale10x_query_ratio_p95",
        "value": sorted(ratios.values())[max(0, int(0.95 * len(ratios)) - 1)],
        "unit": "ratio",
        "corpus_scale_ratio": round(scale, 2),
        "small": points["small"],
        "big": points["big"],
        "query_wall_ratio_big_over_small": ratios,
    }
    print(json.dumps(out))

    rows = "\n".join(
        f"| {k} | {points['small']['queries_min'][k]} | {points['big']['queries_min'][k]} "
        f"| {ratios[k]} | {points['small']['queries_raw'][k]} | {points['big']['queries_raw'][k]} |"
        for k in points["small"]["queries_min"]
    )
    section = f"""## 10x scale point (same workload, {points['small']['n_turns']:,} vs {points['big']['n_turns']:,} turns)

Identical query shapes (df-rank-matched terms) on two corpus sizes built the
same way; min of {runs} warm runs, raw runs committed.  A query at the job
floor shows ratio ~1; postings-bound queries should grow sub-linearly vs the
{scale:.1f}x corpus (block-max skip + per-partition top-k).  Build:
{points['small']['build_turns_per_sec']:,} turns/s small / {points['big']['build_turns_per_sec']:,} turns/s big
(raw {points['small']['build_raw_runs_sec']} vs {points['big']['build_raw_runs_sec']}).

| query | small (s) | big (s) | big/small | small raw | big raw |
|---|---|---|---|---|---|
{rows}

(measured {time.strftime('%Y-%m-%d %H:%M:%S')})
"""
    path = "BENCH/BASELINE.md"
    if os.path.exists(path):
        cur = open(path).read()
        parts = cur.split("\n## ")
        kept = [parts[0]] + [
            "## " + p for p in parts[1:] if not p.startswith("10x scale point")
        ]
        body = "\n".join(s.rstrip() + "\n" for s in kept)
        with open(path, "w") as f:
            f.write(body + "\n" + section)


if __name__ == "__main__":
    main()
