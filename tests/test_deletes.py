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


def test_expunge_delegates_large_delete_sets(spark_corpus, searcher, monkeypatch):
    """A delete set above max_driver_deletes must route through the
    distributed path — the delete ids never get collect()ed to the driver."""
    from lucene_solr_spark.operators import merge as merge_mod

    idx = build_index(spark_corpus, IndexConfig(n_partitions=8)).persist()
    s = IndexSearcher(idx, spark_corpus)
    s.delete_by_query(TermQuery("wolo"))
    assert idx.deletes.count() > 0

    called = {}
    real = merge_mod.expunge_deletes_distributed

    def spy(ix):
        called["distributed"] = True
        return real(ix)

    monkeypatch.setattr(merge_mod, "expunge_deletes_distributed", spy)
    clean = merge_mod.expunge_deletes(idx, max_driver_deletes=0)
    assert called.get("distributed")
    assert clean.deletes is None
    # and the delegated result carries the recomputed stats
    assert clean.doc_count == idx.doc_count - idx.deletes.select("doc_id").distinct().count()


def test_distributed_expunge_matches_broadcast(spark_corpus, searcher):
    """The 100 TB expunge path (range-targeted rewrite, deletes never touch
    the driver) must produce exactly the same index as the broadcast path:
    same stats, same terms table, same postings after decode, same top-k."""
    from lucene_solr_spark.operators.checkindex import check_index
    from lucene_solr_spark.operators.merge import expunge_deletes, expunge_deletes_distributed

    idx = build_index(spark_corpus, IndexConfig(n_partitions=8)).persist()
    s = IndexSearcher(idx, spark_corpus)
    s.delete_by_query(TermQuery("wolo"))
    deleted = {r["doc_id"] for r in idx.deletes.collect()}
    assert deleted

    a = expunge_deletes(idx)
    b = expunge_deletes_distributed(idx)
    assert b.deletes is None
    assert (a.doc_count, a.sum_ttf) == (b.doc_count, b.sum_ttf)

    ta = {(r["term"], r["df"], r["ttf"]) for r in a.terms.collect()}
    tb = {(r["term"], r["df"], r["ttf"]) for r in b.terms.collect()}
    assert ta == tb

    # decoded postings identical (block geometry may differ between paths —
    # the broadcast path renumbers runs — so compare the logical postings)
    def decoded(ix):
        from lucene_solr_spark.functions.codec import unpack_blocks

        rows = ix.postings.collect()
        out = set()
        for r in rows:
            doc_ids, tfs, norms, _ = unpack_blocks(
                np.asarray([r["doc_id_base"]], dtype=np.int64),
                np.asarray([r["count"]], dtype=np.int64),
                [r["doc_ids"]],
                [r["tfs"]],
                [r["norms"]],
            )
            for d, t, n in zip(doc_ids.tolist(), tfs.tolist(), norms.tolist()):
                out.add((r["term"], d, t, n))
        return out

    assert decoded(a) == decoded(b)
    check_index(b, full=True)

    # rank identity through the full query path
    q = TermQuery("the")
    assert _topk(IndexSearcher(a, spark_corpus), q) == _topk(IndexSearcher(b, spark_corpus), q)


def test_distributed_expunge_leaves_untouched_blocks_intact(spark_corpus):
    """Scale property: blocks whose doc range holds no delete are passed
    through byte-identical (never unpacked/repacked)."""
    from lucene_solr_spark.operators.merge import expunge_deletes_distributed
    from lucene_solr_spark.operators.searcher import IndexSearcher as IS

    idx = build_index(spark_corpus, IndexConfig(n_partitions=8)).persist()
    s = IS(idx, spark_corpus)
    s.delete_by_query(TermQuery("wolo"))
    dels = sorted(r["doc_id"] for r in idx.deletes.collect())

    before = {
        (r["term"], r["run_id"], r["block_id"]): (bytes(r["doc_ids"]), bytes(r["tfs"]))
        for r in idx.postings.collect()
    }
    after_idx = expunge_deletes_distributed(idx)
    untouched_same = 0
    for r in after_idx.postings.collect():
        key = (r["term"], r["run_id"], r["block_id"])
        lo, hi = r["doc_id_base"], r["doc_id_max"]
        has_del = any(lo <= d <= hi for d in dels)
        if key in before and not has_del and before[key] == (bytes(r["doc_ids"]), bytes(r["tfs"])):
            untouched_same += 1
    # the overwhelming majority of blocks must ride through unchanged
    assert untouched_same > 0.5 * len(before)
