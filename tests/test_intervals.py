"""Minimal-interval algebra vs brute-force minimality, and the distributed
IntervalQuery path end-to-end.

Brute-force control: an interval [s, e] *matches* ordered(t1..tn) if an
increasing assignment of occurrences exists inside it (any assignment for
unordered); it is *minimal* if no strictly-contained interval matches.  For
distinct single-term sources this is exactly the reference iterator's
output.
"""

import itertools

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.functions.intervals import (
    interval_freq,
    interval_freq_quantized,
    minimal_ordered_intervals,
    minimal_unordered_intervals,
    saturation_score,
)


def _matches_ordered(pos_lists, s, e):
    prev = s - 1
    for pl in pos_lists:
        nxt = [p for p in pl if prev < p <= e]
        if not nxt:
            return False
        prev = min(nxt)
    return True


def _matches_unordered(pos_lists, s, e):
    # distinct-position assignment via greedy bipartite check (small n)
    pools = [[p for p in pl if s <= p <= e] for pl in pos_lists]
    if any(not p for p in pools):
        return False
    # overlaps allowed in the reference default: any occurrence per term
    return True


def _brute_minimal(pos_lists, matcher):
    lo = min(min(p) for p in pos_lists)
    hi = max(max(p) for p in pos_lists)
    matching = [
        (s, e)
        for s in range(lo, hi + 1)
        for e in range(s, hi + 1)
        if matcher(pos_lists, s, e)
    ]
    out = []
    for s, e in matching:
        if not any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e)) for s2, e2 in matching
        ):
            out.append((s, e))
    return sorted(out)


pos_list = st.lists(st.integers(0, 25), min_size=1, max_size=6).map(
    lambda xs: sorted(set(xs))
)


@settings(max_examples=200, deadline=None)
@given(st.lists(pos_list, min_size=2, max_size=3))
def test_ordered_matches_brute_force(pls):
    # make term occurrence sets disjoint (distinct terms in one doc)
    offset = 0
    disjoint = []
    seen = set()
    for pl in pls:
        pl2 = [p for p in pl if p not in seen]
        if not pl2:
            return
        seen.update(pl2)
        disjoint.append(pl2)
    got = sorted((s, e) for s, e, _ in minimal_ordered_intervals(disjoint))
    want = _brute_minimal(disjoint, _matches_ordered)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(pos_list, min_size=2, max_size=3))
def test_unordered_matches_brute_force(pls):
    seen = set()
    disjoint = []
    for pl in pls:
        pl2 = [p for p in pl if p not in seen]
        if not pl2:
            return
        seen.update(pl2)
        disjoint.append(pl2)
    got = sorted((s, e) for s, e, _ in minimal_unordered_intervals(disjoint))
    want = _brute_minimal(disjoint, _matches_unordered)
    assert got == want


def test_ordered_gaps_and_freq():
    # "a x b" and "a b": two minimal intervals, lengths 3 and 2
    iv = minimal_ordered_intervals([[0, 5], [2, 6]])
    assert iv == [(0, 2, 1), (5, 6, 0)]
    f = interval_freq(iv, 2)
    # 1/max(3-2+1,1) + 1/max(2-2+1,1) = 0.5 + 1.0
    assert f == np.float32(1.5)
    # maxgaps=0 drops the first
    assert interval_freq(iv, 2, max_gaps=0) == np.float32(1.0)
    fq = interval_freq_quantized(iv, 2)
    assert fq == int(np.floor(np.float64(np.float32(0.5)) * 1048576)) + 1048576


def test_saturation_monotone():
    s1 = saturation_score(np.float32(0.5))
    s2 = saturation_score(np.float32(1.5))
    assert 0 < s1 < s2 < 1


def test_interval_query_end_to_end(spark):
    import pandas as pd

    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "alpha beta",            # adjacent: freq 1.0
                "alpha x x beta",        # gap 2: freq 1/3
                "beta alpha",            # wrong order for ordered
                "nothing here",
            ],
        }
    )
    corpus = spark.createDataFrame(pdf)
    idx = build_index(corpus, IndexConfig(n_partitions=2, index_positions=True))
    s = IndexSearcher(idx, corpus)

    got = [(r["doc_id"], r["score"]) for r in s.interval_query(["alpha", "beta"], ordered=True, k=10).collect()]
    assert [d for d, _ in got] == [0, 1]
    assert got[0][1] == saturation_score(np.float32(1.0))
    assert got[1][1] == saturation_score(np.float32(1.0) / np.float32(3.0))

    # unordered also matches doc 2
    got_u = [r["doc_id"] for r in s.interval_query(["alpha", "beta"], ordered=False, k=10).collect()]
    assert got_u == [0, 2, 1]  # doc2 interval len 2 -> freq 1.0, ties doc0 (doc_id asc)

    # maxgaps filter drops the gapped doc
    got_g = [r["doc_id"] for r in s.interval_query(["alpha", "beta"], ordered=True, max_gaps=0, k=10).collect()]
    assert got_g == [0]

    # quantized contract path ranks identically
    got_q = [r["doc_id"] for r in s.interval_query(["alpha", "beta"], ordered=True, k=10, output="freq_q").collect()]
    assert got_q == [0, 1]
