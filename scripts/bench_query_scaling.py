#!/usr/bin/env python
"""Query-side scaling: batched BM25 retrieval at N vs 4N cores.

Companion to bench_scaling.py (the build-side north-rule evidence): the
same index, the same N_QUERIES-query batch (1024 by default), two
parallelism levels.  The batch
runs through ``IndexSearcher.batch_search`` — ONE postings scan for the
whole query set (the offline batch-retrieval pattern that matters at
10^12 docs), so throughput is postings-bound, not job-floor-bound like
per-query latencies at small sf.

The index build is NOT timed here (bench_scaling.py owns that metric);
each arm builds once, warms once, then times ``runs`` batch executions
and reports the best (same minimum-estimator rationale as bench.py).

Usage: python scripts/bench_query_scaling.py [n_convs] [runs] [lo_cores]
Reuses /tmp/bench_corpus.parquet when present (set SCALING_REUSE_CORPUS=0
to force re-staging).  Updates the "Query-side scaling" section of
BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import CORPUS, make_corpus  # noqa: E402

# big enough that the per-batch fixed cost (plan compile, term-stats
# resolution, stage scheduling — ~5 s on this box regardless of core count)
# is amortized by postings work; this is the offline-retrieval shape where
# batching pays
N_QUERIES = int(os.environ.get("QSCALE_N_QUERIES", "1024"))


def _query_batch(idx):
    """N_QUERIES deterministic queries spanning the df spectrum: terms
    sampled at evenly-spaced df ranks; alternating single-term and 2-term
    SHOULD booleans (the WAND shape).  Clamped to the available term pool
    for tiny indexes (n_queries <= len(pool)//2)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.plans.query import BooleanQuery, TermQuery

    terms = [
        r["term"]
        for r in idx.terms.orderBy(F.desc("df"), F.asc("term"))
        .limit(4096)
        .collect()
    ]
    # skip the very head (rank 0-7) so one mega-term doesn't dominate the
    # batch wall; stride the rest so df spans head -> tail
    pool = terms[8 :: max(1, (len(terms) - 8) // (2 * N_QUERIES))][: 2 * N_QUERIES]
    # tiny index (small n_convs): fewer than 2*N_QUERIES distinct terms —
    # clamp instead of indexing past the pool
    n_queries = min(N_QUERIES, len(pool) // 2)
    queries = {}
    for i in range(n_queries):
        a, b = pool[2 * i], pool[2 * i + 1]
        if i % 2 == 0:
            queries[f"q{i}"] = TermQuery(a)
        else:
            queries[f"q{i}"] = BooleanQuery.build(should=[TermQuery(a), TermQuery(b)])
    return queries


def timed_batch(cpus: int, runs: int) -> tuple[list[float], int]:
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index_sorted_source
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    idx = build_index_sorted_source(spark, CORPUS, IndexConfig(n_partitions=None))
    queries = _query_batch(idx)
    s = IndexSearcher(idx, None)
    times = []
    for r in range(runs + 1):  # first run is the warm-up
        t0 = time.monotonic()
        n_rows = s.batch_search(queries, 10).count()
        dt = time.monotonic() - t0
        if r > 0:
            times.append(dt)
        print(f"  local[{cpus}] run{r}: {dt:.1f}s ({n_rows} result rows)", file=sys.stderr)
    spark.stop()
    return times, len(queries)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hi = 4 * lo

    if os.environ.get("SCALING_REUSE_CORPUS", "1") == "1" and os.path.exists(CORPUS):
        from lucene_solr_spark.session import get_spark

        spark = get_spark(cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        n_turns = spark.read.parquet(CORPUS).count()
        spark.stop()
    else:
        n_turns = make_corpus(n_convs)
    print(f"corpus: {n_turns} turns", file=sys.stderr)

    results = {}
    n_q = N_QUERIES
    for cpus in (lo, hi):
        times, n_q = timed_batch(cpus, runs)
        best = min(times)
        results[cpus] = {
            "wall_s": round(best, 2),
            "queries_per_sec": round(n_q / best, 1),
            "runs_s": [round(t, 1) for t in times],
        }

    eff = (results[hi]["queries_per_sec"] / results[lo]["queries_per_sec"]) / 4.0
    out = {
        "metric": "batch_query_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_turns": n_turns,
        "n_queries": n_q,
        "lo_cores": lo,
        "lo": results[lo],
        "hi": results[hi],
    }
    print(json.dumps(out))

    section = f"""## Query-side scaling (batched BM25, same index, N vs 4N cores)

{n_q} deterministic queries (term + 2-term WAND booleans, df-spectrum
stride) through ``IndexSearcher.batch_search`` — ONE postings scan per batch,
so the measurement is postings-throughput-bound, not per-job floor.  Index:
{n_turns:,} turns (same corpus as the build-side table).  Best of {runs} warm
runs, raw runs shown.

| config | batch wall (s) | queries/sec | raw runs (s) |
|---|---|---|---|
| local[{lo}]  | {results[lo]['wall_s']} | {results[lo]['queries_per_sec']:,} | {results[lo]['runs_s']} |
| local[{hi}] | {results[hi]['wall_s']} | {results[hi]['queries_per_sec']:,} | {results[hi]['runs_s']} |

**Query scaling efficiency ({lo} -> {hi} cores) = {eff:.3f}** (measured
{time.strftime('%Y-%m-%d %H:%M:%S')}; supplements the build-side north-rule
table above with the second job shape a cluster actually runs).
"""
    path = "BENCH/BASELINE.md"
    if os.path.exists(path):
        cur = open(path).read()
        parts = cur.split("\n## ")
        kept = [parts[0]] + [
            "## " + p for p in parts[1:] if not p.startswith("Query-side scaling")
        ]
        body = "\n".join(s.rstrip() + "\n" for s in kept)
        with open(path, "w") as f:
            f.write(body + "\n" + section)


if __name__ == "__main__":
    main()
