#!/usr/bin/env python
"""Scaling-efficiency benchmark: identical index build at N vs 4N cores.

Sandbox proxy for the north rule's two-cluster-size criterion (BASELINE.md):
the same job + the same parquet input at N and 4N cores; efficiency
= (throughput@4N / throughput@N) / 4.  >=2 warm runs each; the BEST run is
reported (the box's 2-7x hypervisor-steal variance makes the minimum the
stable capability number — same estimator as bench.py) with all raw runs
listed alongside.

Usage: python scripts/bench_scaling.py [n_convs] [runs]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/bench_corpus.parquet"


def make_corpus(n_convs: int) -> int:
    from lucene_solr_spark.session import get_spark
    from lucene_solr_spark.sources.transcripts import transcripts_df_dist

    spark = get_spark(cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(CORPUS):
        shutil.rmtree(CORPUS)
    # 256 files: fine task granularity so wave quantization / stragglers
    # don't distort the high-core arm (16 waves at local[16], 64 at local[4]);
    # per-file metadata comes from footers, so file count is build-time free
    df = transcripts_df_dist(spark, n_convs, n_partitions=256)
    df.write.mode("overwrite").parquet(CORPUS)
    n = spark.read.parquet(CORPUS).count()
    spark.stop()
    return n


def timed_build(cpus: int, runs: int) -> list[float]:
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index_sorted_source
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for r in range(runs + 1):  # first run is the warm-up
        t0 = time.monotonic()
        # fused sorted-table fast path (production layout: Iceberg sortedBy):
        # ids from per-file counts + analysis + packing in ONE Python pass,
        # zero corpus shuffles end-to-end
        idx = build_index_sorted_source(spark, CORPUS, IndexConfig(n_partitions=None))
        # the stats collect inside the build consumes every row of the
        # persisted run output — the whole index is materialized in cache
        assert idx.doc_count > 0
        dt = time.monotonic() - t0
        spark.catalog.clearCache()  # drop this run's persisted runs/corpus
        if r > 0:
            times.append(dt)
        print(f"  local[{cpus}] run{r}: {dt:.1f}s", file=sys.stderr)
    spark.stop()
    return times


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hi = 4 * lo  # the north rule's N -> 4N pair; 4N must stay under nproc
    # to avoid measuring core oversubscription instead of the job

    if os.environ.get("SCALING_REUSE_CORPUS") == "1" and os.path.exists(CORPUS):
        # iterate on run counts without re-staging the (deterministic) input
        from lucene_solr_spark.session import get_spark

        spark = get_spark(cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        n_turns = spark.read.parquet(CORPUS).count()
        spark.stop()
    else:
        n_turns = make_corpus(n_convs)
    print(f"corpus: {n_turns} turns", file=sys.stderr)

    results = {}
    for cpus in (lo, hi):
        times = timed_build(cpus, runs)
        # best-of, matching bench.py's estimator: this box shows 2-7x
        # run-to-run wall variance from hypervisor steal, and run sequences
        # trend monotonically as co-tenant load shifts — the minimum is the
        # stable capability number, the median inherits the noise.  The raw
        # runs are reported alongside so the spread stays visible.
        best = min(times)
        results[cpus] = {
            "wall_s": round(best, 2),
            "turns_per_sec": round(n_turns / best, 1),
            "runs_s": [round(t, 1) for t in times],
        }

    eff = (results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]) / 4.0
    out = {
        "metric": "index_build_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_turns": n_turns,
        "lo_cores": lo,
        "lo": results[lo],
        "hi": results[hi],
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    # preserve hand-written sections (e.g. the A/B attribution tables) —
    # everything except the regenerated scaling block and the Notes tail
    keep = []
    if os.path.exists("BENCH/BASELINE.md"):
        cur = open("BENCH/BASELINE.md").read()
        for sec in cur.split("\n## ")[1:]:
            title = sec.split("\n", 1)[0]
            if not title.startswith(("Scaling efficiency", "Notes")):
                keep.append("## " + sec.rstrip() + "\n")
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured baselines

## Scaling efficiency (north-rule criterion, sandbox proxy)

Same job (parquet scan → stable doc_id assignment → analysis → posting-run
build with delta+varint blocks → stats aggregation), same input
({n_turns:,} synthetic transcript turns, seed=42), two parallelism levels.
Best of {runs} warm runs (1 warm-up discarded) — the box's documented
2-7x hypervisor-steal variance makes the minimum the stable capability
number (same estimator as bench.py); all raw runs shown.

| config | wall (s) | throughput (turns/sec) | raw runs (s) |
|---|---|---|---|
| local[{lo}]  | {results[lo]['wall_s']} | {results[lo]['turns_per_sec']:,} | {results[lo]['runs_s']} |
| local[{hi}] | {results[hi]['wall_s']} | {results[hi]['turns_per_sec']:,} | {results[hi]['runs_s']} |

**Scaling efficiency ({lo} -> {hi} cores) = {eff:.3f}** (target >= 0.8,
BASELINE.json north_rule; efficiency = (tp@4N / tp@N) / 4).

Measured {time.strftime('%Y-%m-%d %H:%M:%S')} on local mode,
spark.sql.shuffle.partitions = cores, AQE on, Arrow batch 4096.

## Notes

- The build is partition-parallel with no shuffle on raw postings
  (one task = one DWPT analog), so scaling is limited only by input split
  granularity and the tiny stats aggregations — the same property that makes
  the 1000-executor plan linear.
- Query-side latencies per round live in BENCH_r{{N}}.json (driver-run
  `bench.py`).
"""
        )
        for sec in keep:
            f.write("\n" + sec)


if __name__ == "__main__":
    main()
