"""Reference-exact MoreLikeThis (lucene/queries/.../mlt/MoreLikeThis.java):
tf/df gates, ClassicSimilarity-idf term ranking, top-25 selection, min-heap
boost normalization quirk — brute-recomputed from the oracle's postings.
"""

import numpy as np
import pytest

from lucene_solr_spark.plans.query import BoostQuery, MatchNoDocsQuery, TermQuery

DOC = 7


def _brute_selection(oracle, doc_id, min_tf=2, min_df=5, max_df=None, max_terms=25):
    counts: dict = {}
    for t in oracle.analyzer.tokens(oracle.texts[doc_id]):
        counts[t] = counts.get(t, 0) + 1
    n = oracle.doc_count
    scored = []
    for t, tf in counts.items():
        if tf < min_tf:
            continue
        df = len(oracle.postings.get(t, ()))
        if df < min_df:
            continue
        if max_df is not None and df > max_df:
            continue
        idf = np.float32(np.log((n + 1) / float(df + 1)) + 1.0)
        scored.append((float(np.float32(tf * idf)), t))
    scored.sort(key=lambda st: (-st[0], st[1]))
    return scored[:max_terms]


def test_term_selection_matches_brute(searcher, oracle):
    q = searcher.more_like_this_query(DOC)
    want = [t for _, t in _brute_selection(oracle, DOC)]
    got = [c.query.term for c in q.clauses]
    assert got == want


def test_gates_and_limit(searcher, oracle):
    q = searcher.more_like_this_query(DOC, min_term_freq=1, min_doc_freq=1, max_query_terms=5)
    want = [t for _, t in _brute_selection(oracle, DOC, min_tf=1, min_df=1, max_terms=5)]
    assert [c.query.term for c in q.clauses] == want

    # max_doc_freq caps the high-df end (compare against the brute gate —
    # the fixture may leave this empty, which must map to MatchNoDocs)
    q2 = searcher.more_like_this_query(DOC, min_term_freq=1, min_doc_freq=1, max_doc_freq=10)
    want2 = [t for _, t in _brute_selection(oracle, DOC, min_tf=1, min_df=1, max_df=10)]
    got2 = [] if isinstance(q2, MatchNoDocsQuery) else [c.query.term for c in q2.clauses]
    assert got2 == want2
    for t in got2:
        assert 1 <= len(oracle.postings[t]) <= 10


def test_boost_normalizes_by_min_retained(searcher, oracle):
    q = searcher.more_like_this_query(DOC, boost=True, boost_factor=2.0)
    sel = _brute_selection(oracle, DOC)
    best = min(s for s, _ in sel)
    want = {t: float(np.float32(2.0 * s / best)) for s, t in sel}
    for c in q.clauses:
        assert isinstance(c.query, BoostQuery)
        assert c.query.boost == pytest.approx(want[c.query.query.term], rel=0, abs=0)
        assert c.query.boost >= 2.0


def test_search_rank_identity(searcher, oracle):
    q = searcher.more_like_this_query(DOC)
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.search(q, 10, exclude_doc_ids=[DOC]).df.collect()
    ]
    want = [(d, s) for d, s in oracle.search(q, 11) if d != DOC][:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-6)


def test_missing_doc_is_match_none(searcher):
    assert isinstance(searcher.more_like_this_query(10**9), MatchNoDocsQuery)
