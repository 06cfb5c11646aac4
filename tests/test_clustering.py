"""Search-result clustering (operators/clustering.py): determinism, full
coverage of the page, and separation of planted topic groups."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.plans.query import TermQuery


def _hot(searcher):
    return searcher.index.terms.orderBy(F.desc("df"), F.asc("term")).limit(1).collect()[0]["term"]


def test_cluster_results_covers_page_deterministically(searcher):
    from lucene_solr_spark.operators.clustering import cluster_results

    hot = _hot(searcher)
    top_ids = {d for d, _ in searcher.search(TermQuery(hot), 20).collect()}
    a = {r["doc_id"]: r["cluster"] for r in cluster_results(searcher, TermQuery(hot), n=20, k=3).collect()}
    b = {r["doc_id"]: r["cluster"] for r in cluster_results(searcher, TermQuery(hot), n=20, k=3).collect()}
    assert a == b  # deterministic end to end (init, Lloyd, assignment)
    assert set(a) == top_ids  # every hit of the page gets exactly one cluster
    assert set(a.values()) <= {0, 1, 2}


def test_cluster_results_separates_planted_topics(spark):
    """Two disjoint-vocabulary topic groups sharing one hot query term land
    in different clusters."""
    from lucene_solr_spark.functions.analysis import simple_analyzer
    from lucene_solr_spark.operators.clustering import cluster_results
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    rows = []
    for i in range(8):
        rows.append((i, "shared kernel driver interrupt memory " + "alpha beta gamma " * 3))
    for i in range(8, 16):
        rows.append((i, "shared salad recipe tomato basil " + "delta epsilon zeta " * 3))
    corpus = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    idx = build_index(corpus, IndexConfig(analyzer=simple_analyzer(), n_partitions=4))
    s = IndexSearcher(idx, corpus)
    got = {r["doc_id"]: r["cluster"] for r in cluster_results(s, TermQuery("shared"), n=16, k=2).collect()}
    assert len(got) == 16
    tech = {got[i] for i in range(8)}
    food = {got[i] for i in range(8, 16)}
    assert len(tech) == 1 and len(food) == 1 and tech != food
