"""Extreme term-skew stress: a term present in EVERY document.

The north rule calls out Zipf-head skew as the failure mode of
groupBy(term)-shaped work. Build over a corpus where one term has df = N,
force a salted full merge with a tiny per-group budget, and verify the salted
layout (bounded groups, contiguous doc ranges) plus rank identity.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
from lucene_solr_spark.operators.merge import force_merge, merge_runs, run_manifest
from lucene_solr_spark.operators.searcher import IndexSearcher
from lucene_solr_spark.plans.query import BooleanQuery, TermQuery

HOT = "zzcommon"
SALT_BUDGET = 256


@pytest.fixture(scope="module")
def skew_setup(spark):
    rng = np.random.default_rng(11)
    n = 4000
    fillers = [f"w{int(i)}" for i in rng.integers(0, 300, n * 5)]
    texts = [
        f"{HOT} " + " ".join(fillers[i * 5 : (i + 1) * 5]) + (f" {HOT}" if i % 3 == 0 else "")
        for i in range(n)
    ]
    pdf = pd.DataFrame({"conv_id": [f"c{i:06d}" for i in range(n)], "turn_idx": 0, "text": texts})
    corpus = assign_doc_ids(spark.createDataFrame(pdf), ("conv_id", "turn_idx"), n_partitions=8).persist()
    idx = build_index(corpus, IndexConfig(n_partitions=8)).persist()
    return corpus, idx


def test_hot_term_salted_merge_bounds_groups(skew_setup):
    corpus, idx = skew_setup
    ids = [r.run_id for r in run_manifest(idx)]
    merged = merge_runs(idx, ids, new_run_id=9_999, salt_block_budget=SALT_BUDGET).persist()

    hot_blocks = merged.filter(F.col("term") == HOT).select("block_id", "doc_id_base", "count").toPandas()
    assert hot_blocks["count"].sum() == 4000  # df == N
    salts = (hot_blocks["block_id"] // (1 << 20)).unique()
    assert len(salts) >= 10  # actually salted, not one giant group
    # every salted sub-run stays within ~budget and covers a contiguous range
    per_salt = hot_blocks.groupby(hot_blocks["block_id"] // (1 << 20))
    sizes = per_salt["count"].sum()
    assert (sizes <= 2 * SALT_BUDGET).all()
    lo = per_salt["doc_id_base"].min().sort_values()
    assert lo.is_monotonic_increasing  # doc-range (not hash) salting

    # rank identity through the salted layout
    from dataclasses import replace

    s0 = IndexSearcher(idx, corpus, prune_min_postings=0)
    s1 = IndexSearcher(replace(idx, postings=merged), corpus, prune_min_postings=0)
    for q in [TermQuery(HOT), BooleanQuery.build(must=[TermQuery(HOT), TermQuery("w5")])]:
        a = [(d, float(np.float32(s))) for d, s in s0.search(q, 10).collect()]
        b = [(d, float(np.float32(s))) for d, s in s1.search(q, 10).collect()]
        assert a == b


def test_hot_term_force_merge_identity(skew_setup):
    corpus, idx = skew_setup
    one = force_merge(idx, max_runs=1)
    s0 = IndexSearcher(idx, corpus, prune_min_postings=0)
    s1 = IndexSearcher(one, corpus, prune_min_postings=0)
    q = TermQuery(HOT)
    assert s0.search(q, 10).collect() == s1.search(q, 10).collect()
    assert s1.count(q) == 4000
