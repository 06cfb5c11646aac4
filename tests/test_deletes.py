"""Delete (live-docs) semantics: mark-deleted + merge-time reclamation."""

import numpy as np

from lucene_solr_spark.operators.indexer import IndexConfig, build_index
from lucene_solr_spark.operators.searcher import IndexSearcher
from lucene_solr_spark.plans.query import BooleanQuery, TermQuery


def _topk(s, q, k=10):
    return [(d, float(np.float32(sc))) for d, sc in s.search(q, k).collect()]


def test_delete_then_expunge(spark_corpus, searcher):
    from lucene_solr_spark.operators.checkindex import check_index
    from lucene_solr_spark.operators.merge import expunge_deletes

    idx = build_index(spark_corpus, IndexConfig(n_partitions=8)).persist()
    s = IndexSearcher(idx, spark_corpus)
    q = TermQuery("the")
    before = _topk(s, q)
    n_before = s.count(q)

    # delete everything containing the rare term 'wolo'
    s.delete_by_query(TermQuery("wolo"))
    deleted = {r["doc_id"] for r in idx.deletes.collect()}
    assert deleted, "fixture must contain the term"

    # deleted docs vanish from results; stats (hence scores of the rest)
    # are unchanged until expunge — reference behavior
    after = _topk(s, q)
    assert all(d not in deleted for d, _ in after)
    surviving = [(d, sc) for d, sc in before if d not in deleted]
    assert after[: len(surviving[:10])] == surviving[:10]
    assert s.count(TermQuery("wolo")) == 0
    assert s.count(q) <= n_before

    # expunge: postings reclaimed, stats recomputed, index still valid
    clean = expunge_deletes(idx)
    assert clean.deletes is None
    assert clean.doc_count == searcher.index.doc_count - len(deleted)
    s2 = IndexSearcher(clean, spark_corpus)
    assert s2.count(TermQuery("wolo")) == 0
    check_index(clean, full=True)
    # every remaining hit is live
    for d, _ in _topk(s2, q):
        assert d not in deleted
