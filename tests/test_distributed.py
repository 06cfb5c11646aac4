"""Sharded search with global statistics (ExactStatsCache / MultiReader
semantics): the control-vs-sharded equivalence — results over split parts
must be BIT-identical (doc ids AND float32 scores) to the undivided index."""

import pytest

from lucene_solr_spark.functions.similarities import ClassicSimilarity
from lucene_solr_spark.operators.distributed import MultiIndexSearcher
from lucene_solr_spark.operators.merge import split_index
from lucene_solr_spark.operators.searcher import IndexSearcher
from lucene_solr_spark.plans.query import BooleanQuery, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def sharded(index8, spark_corpus):
    parts = split_index(index8, [700, 1900])
    return MultiIndexSearcher(parts, corpus=spark_corpus)


@pytest.fixture(scope="module")
def control(index8, spark_corpus):
    return IndexSearcher(index8, spark_corpus)


def _queries(oracle):
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    mid = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))[3]
    rare = min(oracle.postings, key=lambda t: (len(oracle.postings[t]), t))
    return [
        TermQuery(hot),
        TermQuery(rare),
        BooleanQuery.build(should=[TermQuery(hot), TermQuery(mid)]),
        BooleanQuery.build(must=[TermQuery(hot), TermQuery(mid)]),
        BooleanQuery.build(must=[TermQuery(hot)], must_not=[TermQuery(rare)]),
    ]


def test_control_vs_sharded_bit_identity(sharded, control, oracle):
    for q in _queries(oracle):
        for prune in (True, False):
            assert sharded.search(q, 10, prune=prune).collect() == control.search(
                q, 10, prune=prune
            ).collect(), q


def test_sharded_count_and_fetch(sharded, control, oracle):
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    assert sharded.count(TermQuery(hot)) == control.count(TermQuery(hot))
    top = sharded.search(TermQuery(hot), 5)
    rows = sharded.fetch(top, columns=["text"]).collect()
    assert len(rows) == 5 and all(hot in r["text"].lower() for r in rows)


def test_sharded_with_similarity(sharded, control, index8, spark_corpus, oracle):
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    sh = MultiIndexSearcher(sharded.parts, corpus=spark_corpus, similarity=ClassicSimilarity())
    ctl = IndexSearcher(index8, spark_corpus, similarity=ClassicSimilarity())
    assert sh.search(TermQuery(hot), 10).collect() == ctl.search(TermQuery(hot), 10).collect()


def test_empty_part_is_harmless(index8, spark_corpus, control, oracle):
    # a boundary beyond the doc range yields an empty third part
    parts = split_index(index8, [900, 10_000_000])
    sh = MultiIndexSearcher(parts, corpus=spark_corpus)
    assert sh.doc_count == control.index.doc_count
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    assert sh.search(TermQuery(hot), 10).collect() == control.search(TermQuery(hot), 10).collect()


def test_rejects_empty_part_list(spark_corpus):
    with pytest.raises(ValueError):
        MultiIndexSearcher([])
