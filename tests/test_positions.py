"""Positional postings (DOCS_AND_FREQS_AND_POSITIONS) tests.

The positional phrase path must equal the two-phase (re-analysis) path
exactly, and positions must survive the salted merge.
"""

import numpy as np
import pytest

from lucene_solr_spark.operators.indexer import IndexConfig, build_index
from lucene_solr_spark.operators.searcher import IndexSearcher
from lucene_solr_spark.plans.query import PhraseQuery, TermQuery


def _topk(searcher, q, k=10):
    return [(d, float(np.float32(s))) for d, s in searcher.search(q, k).collect()]


@pytest.fixture(scope="module")
def pos_index(spark_corpus):
    return build_index(spark_corpus, IndexConfig(n_partitions=8, index_positions=True)).persist()


def test_positional_phrase_equals_two_phase(spark_corpus, pos_index, searcher):
    s_pos = IndexSearcher(pos_index, spark_corpus)
    for phrase in [("the", "and"), ("the", "of", "to")]:
        q = PhraseQuery(phrase)
        assert _topk(s_pos, q) == _topk(searcher, q), phrase


def test_positional_phrase_without_corpus(pos_index, searcher):
    # the positional index answers phrases with NO stored-field access
    s_pos = IndexSearcher(pos_index, corpus=None)
    q = PhraseQuery(("the", "and"))
    assert _topk(s_pos, q) == _topk(searcher, q)


def test_positions_survive_merge(spark_corpus, pos_index, searcher):
    from lucene_solr_spark.operators.merge import force_merge, run_manifest

    merged = force_merge(pos_index, max_runs=1)
    assert len(run_manifest(merged)) == 1
    assert merged.postings.filter("positions IS NULL").count() == 0
    s2 = IndexSearcher(merged, corpus=None)
    q = PhraseQuery(("the", "and"))
    assert _topk(s2, q) == _topk(searcher, q)


def test_non_positional_index_has_null_positions(index8):
    assert index8.postings.filter("positions IS NOT NULL").count() == 0
