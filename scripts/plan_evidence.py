#!/usr/bin/env python
"""Generate BENCH/PLANS.md: physical-plan and pruning evidence at sf0.1.

Captures (a) the top-k operator (TakeOrderedAndProject) of the flagship
query, (b) parquet predicate pushdown on a WRITTEN index (the production
layout — the in-session index is cached, so its scan is in-memory),
(c) measured block-max skip rates on the uniform sf corpus AND on a skewed
demo corpus that shows the mechanism's headroom, (d) bloom run pruning for
a docFreq-1 term — the "explain the plan and iterate" artifacts."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
IDX_TMP = "/tmp/plans_evidence_idx"


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_solr_spark.session import get_spark

    spark = get_spark(cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark import driver_contract as dc
    from lucene_solr_spark.operators.bloom import build_term_blooms, prune_run_ids
    from lucene_solr_spark.operators.indexer import IndexConfig, InvertedIndex, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import BooleanQuery, TermQuery

    s = dc.doc_searcher(spark, SF)
    hot, mid = dc.HOT, dc.MID

    # ---- (a) top-k operator of the flagship search
    top = s.search(TermQuery(hot), 10, prune=False)
    plan = top.df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    topk_detail = next(seg for seg in plan.split("\n\n") if seg.startswith("(") and "TakeOrderedAndProject" in seg)

    # ---- (b) pushdown on the WRITTEN (term-sorted parquet) index
    if os.path.exists(IDX_TMP):
        shutil.rmtree(IDX_TMP)
    s.index.write(IDX_TMP)
    written = InvertedIndex.read(spark, IDX_TMP, s.index.config)
    scan = written.postings.filter(F.col("term").isin([hot, mid]))
    wplan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pushed = next(seg for seg in wplan.split("\n\n") if "PushedFilters" in seg)
    pushed = "\n".join(ln for ln in pushed.splitlines() if not ln.startswith("Location"))

    # ---- (c) block-max skip rates: sf corpus + skewed demo
    s0 = dc.doc_searcher(spark, SF)
    s0.prune_min_postings = 0
    m_hot = s0.prune_metrics(TermQuery(hot), k=10)
    m_or = s0.prune_metrics(BooleanQuery.build(should=[TermQuery(hot), TermQuery(mid)]), k=10)

    # skewed demo: 20k docs containing 'skew' once, 40 docs with tf 20-59 —
    # the Zipf-head shape real corpora have; θ lands above the tf-1 blocks
    rows = []
    for i in range(20040):
        tf = 20 + (i % 40) if i < 40 else 1
        extra = f"rare{i} " if i % 100 == 0 else ""  # per-run-distinct rare terms
        rows.append((f"c{i:06d}", 0, ("skew " * tf) + ("needle0427 " if i == 77 else "") + extra + "filler tail words"))
    demo_pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    demo = assign_doc_ids(spark.createDataFrame(demo_pdf), ("conv_id", "turn_idx"), n_partitions=16)
    demo_idx = build_index(demo, IndexConfig(n_partitions=16)).persist()
    ds = IndexSearcher(demo_idx, demo, prune_min_postings=0)
    m_skew = ds.prune_metrics(TermQuery("skew"), k=10)
    ident = ds.search(TermQuery("skew"), 10, prune=True).collect() == ds.search(
        TermQuery("skew"), 10, prune=False
    ).collect()

    # ---- (d) bloom run pruning for a docFreq-1 term (the skew demo has
    # one: the sf corpus vocabulary is fixed, every term is frequent there)
    blooms = build_term_blooms(demo_idx).persist()
    n_runs = blooms.count()
    df1 = {"term": "needle0427", "df": 1}
    passing = prune_run_ids(blooms, [df1["term"]])

    # ---- (e) shape index: bbox pre-filter pushes to the triangle parquet
    from lucene_solr_spark.operators.shapes import shape_box_query, write_shape_index

    SHAPE_TMP = "/tmp/plan_evidence_shapes"
    from lucene_solr_spark.operators.shapes import shape_triangles

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    clat = (F.col("c_custkey") * 7919 % 16000) / F.lit(100.0) - F.lit(80.0)
    clon = (F.col("c_custkey") * 104729 % 34000) / F.lit(100.0) - F.lit(170.0)
    r = (F.col("c_custkey") % 5 + 1) * F.lit(0.31) + F.lit(0.0043)
    dia = cust.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.array(clat + r, clat, clat - r, clat).alias("lats"),
        F.array(clon, clon + 2 * r, clon, clon - 2 * r).alias("lons"),
    )
    if os.path.exists(SHAPE_TMP):
        shutil.rmtree(SHAPE_TMP)
    write_shape_index(shape_triangles(dia, ["c_custkey"]), SHAPE_TMP, n_partitions=16)
    stored = spark.read.parquet(SHAPE_TMP)
    n_total = stored.count()
    boxq = shape_box_query(stored, ["c_custkey"], -10.005, 25.005, 30.005, 90.005)
    splan = boxq._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    spushed = next(seg for seg in splan.split("\n\n") if "PushedFilters" in seg and "tmin" in seg)
    spushed = "\n".join(ln for ln in spushed.splitlines() if not ln.startswith("Location"))
    n_hits = len(boxq.collect())  # execute so AQE finalizes this plan object
    _fin = boxq._jdf.queryExecution().executedPlan().toString()
    # executed plans mark codegen stages with "*(id)" prefixes
    codegen_ok = "*(" in next(ln for ln in _fin.splitlines() if "Filter" in ln)

    def fmt(m):
        return (
            f"blocks {m['surviving_blocks']}/{m['blocks']} survive "
            f"(skip {100 * m['block_skip_rate']:.1f} %), postings "
            f"{m['surviving_postings']}/{m['postings']} "
            f"(skip {100 * m['posting_skip_rate']:.1f} %), θ = {m['theta']:.3g}"
        )

    doc = f"""# BENCH/PLANS — physical-plan and pruning evidence (sf0.1)

Generated by `scripts/plan_evidence.py`. The properties that decide 100 TB
viability, shown on real plans and measured on real runs.

## 1. Top-k never sorts the corpus

The flagship search compiles to `TakeOrderedAndProject` — per-partition
k-heaps, k rows to the driver:

```
{topk_detail.strip()}
```

## 2. Term lookups push down to parquet

On the WRITTEN index (term-sorted parquet, the production layout — the
in-session index is cached so its scan is in-memory), the term predicate
reaches the scan and row-group min/max stats prune before any byte is read:

```
{pushed.strip()}
```

## 3. Block-max (ImpactsDISI-analog) skip rates

Measured with `IndexSearcher.prune_metrics`; results are identical with
pruning on/off (pinned by tests).

- sf0.1 documents corpus, `TermQuery({hot!r})` k=10: {fmt(m_hot)}
- sf0.1 documents corpus, `SHOULD({hot!r}, {mid!r})` k=10: {fmt(m_or)}
- skewed demo (20,040 docs; 40 Zipf-head docs tf 20-59, 20,000 tail docs
  tf 1 — the shape real term distributions have), `TermQuery('skew')` k=10:
  {fmt(m_skew)} — pruned/exhaustive identity: {ident}

The sf corpus is deliberately uniform (synthetic, low tf variance), so its
block maxima are flat and θ cannot cut much — the skew demo shows the same
machinery removing the posting tail when the distribution has a head, which
is exactly the 10^12-turn regime (Zipf head terms + quantized norms give
high-impact blocks a long low-impact tail).

## 4. Bloom run pruning (FuzzySet analog)

- demo index: {n_runs} runs; runs passing the bloom for the docFreq-1
  term {df1["term"]!r}: {len(passing)} — the other
  {n_runs - len(passing)} runs' postings row groups are never read for that
  lookup (the primary-key / rare-term case BloomFilteringPostingsFormat
  exists for; term-sorted min/max pruning alone cannot reject a term that
  falls inside a run's [min, max] range).

## 5. Shape index (LatLonShape analog): bbox pruning + codegen

The triangle table is range-partitioned + sorted on (tmin_y, tmin_x) by
`write_shape_index`; a box query's pre-filter reaches the parquet scan as
pushed min/max comparisons, so row groups outside the query box are never
read — the BKD inner-node role:

```
{spushed.strip()}
```

Triangle table: {n_total} rows ({n_hits} shapes intersect the demo box);
the exact Rectangle2D predicate tree runs inside a whole-stage-codegen
stage (the filter line carries the `*(id)` codegen marker): {codegen_ok}.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write(doc)
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
