"""FastVectorHighlighter: trie flattening, longest-match phrase extraction,
fragment window geometry, boundary scanning, weighted fragments, and the
Spark k-row plumbing (reference lucene/highlighter/.../vectorhighlight/)."""

import math

import numpy as np
import pytest

from lucene_solr_spark.operators.fvh import (
    _find_end_offset,
    _find_start_offset,
    build_phrase_trie,
    field_phrase_list,
    fvh_highlight,
    highlight_document,
)
from lucene_solr_spark.plans.query import (
    BooleanQuery,
    BoostQuery,
    PhraseQuery,
    SynonymQuery,
    TermQuery,
)


def _tokens(text):
    import re

    return [
        (m.group(), p, m.start(), m.end())
        for p, m in enumerate(re.finditer(r"[a-z0-9]+", text.lower()))
    ]


# ------------------------------------------------------ FieldQuery.flatten
def test_flatten_boolean_tree_boosts_and_must_not():
    q = BooleanQuery.build(
        must=[BoostQuery(TermQuery("a"), 2.0)],
        should=[PhraseQuery(("b", "c")), SynonymQuery(("d", "e"))],
        must_not=[TermQuery("z")],
    )
    trie = build_phrase_trie(q)
    assert set(trie) == {"a", "b", "d", "e"}  # MUST_NOT contributes nothing
    assert trie["a"].terminal and trie["a"].boost == 2.0
    assert not trie["b"].terminal  # phrase head only terminal at the tail
    assert trie["b"].children["c"].terminal
    assert trie["d"].terminal and trie["e"].terminal


def test_flatten_rejects_sloppy_phrase():
    with pytest.raises(NotImplementedError):
        build_phrase_trie(PhraseQuery(("a", "b"), slop=2))


# --------------------------------------------- FieldPhraseList longest match
def test_longest_match_with_backtracking():
    # entries {a, a b c}: "a b" dead-ends at the trie's non-terminal b node,
    # pops back to the valid single-term "a" (FieldPhraseList.java:86-116)
    trie = build_phrase_trie([(("a",), 1.0), (("a", "b", "c"), 1.0)])
    plist = field_phrase_list(_tokens("a b x a b c"), trie)
    assert [(p.start, p.end) for p in plist] == [(0, 1), (6, 11)]
    # adjacent phrase positions merge into ONE Toffs span
    assert plist[1].toffs == [[6, 11]]
    assert plist[1].terms == ["a", "b", "c"]


def test_greedy_consumption_skips_inner_match():
    # after "a b" matches, the scan resumes AFTER it: the "b c" starting
    # inside the consumed span is never produced
    trie = build_phrase_trie([(("a", "b"), 1.0), (("b", "c"), 1.0)])
    plist = field_phrase_list(_tokens("a b c"), trie)
    assert [(p.start, p.end) for p in plist] == [(0, 3)]


def test_position_gap_breaks_phrase():
    trie = build_phrase_trie([(("a", "b"), 1.0)])
    assert field_phrase_list(_tokens("a x b"), trie) == []
    assert len(field_phrase_list(_tokens("a b"), trie)) == 1


# ------------------------------------------------------- boundary scanning
def test_boundary_scanner_simple():
    # SimpleBoundaryScanner: scan backwards/forwards to a boundary char,
    # give up after maxScan and return the original offset
    assert _find_start_offset("ab.cdef", 5, 20) == 3
    assert _find_start_offset("abcdefghij", 5, 2) == 5  # maxScan exhausted
    assert _find_start_offset("abcdef", 0, 20) == 0  # start < 1 short-circuit
    assert _find_end_offset("ab cdef", 3, 20) == 3  # no boundary to the right
    assert _find_end_offset("abc def", 1, 20) == 3


# -------------------------------------------------- window geometry (hand)
def test_fragment_windows_margin_recentering():
    # frag_char_size=18, margin=6: first window pulls both leading matches
    # then re-centers with newMargin=(18-12)//2=3; second starts past
    # startOffset=18 with newMargin=7, boundary-scanned back to 'ss'
    text = "xx scan yy scan zz ww qq rr ss tt uu scan vv"
    trie = build_phrase_trie([(("scan",), 1.0)])
    n, best, frags = highlight_document(
        text, trie, frag_char_size=18, max_num_fragments=2
    )
    assert n == 2
    assert best == 2.0  # first fragment holds two boost-1 matches
    assert frags == ["xx <b>scan</b> yy <b>scan</b> zz", "ss tt uu <b>scan</b> vv"]


def test_score_order_vs_source_order():
    text = "xx scan yy scan zz ww qq rr ss tt uu scan vv"
    trie = build_phrase_trie([(("scan",), 1.0)])
    _, _, frags = highlight_document(
        text, trie, frag_char_size=18, max_num_fragments=2, score_order=False
    )
    assert frags[0].count("<b>") == 2  # source order happens to equal score
    _, best1, one = highlight_document(text, trie, frag_char_size=18)
    assert len(one) == 1 and best1 == 2.0


def test_colored_tags_by_seqnum():
    trie = build_phrase_trie([(("a",), 1.0), (("a", "b", "c"), 1.0)])
    _, _, frags = highlight_document(
        "a b x a b c",
        trie,
        frag_char_size=18,
        pre_tags=("<1>", "<2>"),
        post_tags=("</1>", "</2>"),
    )
    assert frags == ["<1>a</1> b x <2>a b c</2>"]


def test_frag_char_size_floor():
    trie = build_phrase_trie([(("a",), 1.0)])
    with pytest.raises(ValueError):
        highlight_document("a", trie, frag_char_size=17)


# ------------------------------------------------- WeightedFieldFragList
def test_weighted_fragments_distinct_terms_sqrt_bend():
    # WeightedFieldFragList.add: only the FIRST occurrence of each distinct
    # term contributes weight*boost; totalBoost bent by len/sqrt(len)
    tw = {"a": 3.0, "c": 0.5}
    trie = build_phrase_trie([(("a",), 1.0), (("c",), 1.0)])
    n, best, frags = highlight_document(
        "a c a", trie, frag_char_size=18, weighted=True, term_weights=tw
    )
    norm = np.float32(3 * (1.0 / math.sqrt(3)))
    want = np.float32(
        np.float32(np.float32(np.float32(3.0) * np.float32(1.0)) * norm)
        + np.float32(np.float32(np.float32(0.5) * np.float32(1.0)) * norm)
    )  # third 'a' adds f32(0 * norm) = 0
    assert n == 1
    assert best == pytest.approx(float(want), rel=0, abs=0)
    assert frags == ["<b>a</b> <b>c</b> <b>a</b>"]


# ----------------------------------------------------------- Spark plumbing
def test_fvh_spark_matches_local_recompute(searcher):
    q = BooleanQuery.build(
        should=[TermQuery("numa"), PhraseQuery(("ge0", "vecodu"))]
    )
    top = searcher.search(TermQuery("ge0"), 5)
    out = {
        r["doc_id"]: r
        for r in fvh_highlight(searcher, top, q, frag_char_size=4096).collect()
    }
    assert len(out) == 5
    trie = build_phrase_trie(q)
    texts = {
        r["doc_id"]: r["text"]
        for r in searcher.fetch(top, columns=["text"]).collect()
    }
    for doc_id, row in out.items():
        n, best, frags = highlight_document(
            texts[doc_id], trie, frag_char_size=4096
        )
        assert row["n_frags"] == n
        assert row["frag_score"] == pytest.approx(best, rel=0, abs=0)
        assert list(row["fragments"]) == frags
        if frags:
            assert row["fragments"][0].replace("<b>", "").replace("</b>", "") == texts[doc_id]


def test_fvh_spark_weighted_uses_index_idf(searcher):
    q = BooleanQuery.build(should=[TermQuery("ge0"), TermQuery("numa")])
    top = searcher.search(TermQuery("ge0"), 3)
    out = {
        r["doc_id"]: r
        for r in fvh_highlight(
            searcher, top, q, frag_char_size=4096, frag_list="weighted"
        ).collect()
    }
    stats = searcher._term_stats({"ge0", "numa"})
    nd = searcher.index.doc_count
    tw = {
        t: float(np.float32(math.log(nd / (df + 1.0)) + 1.0))
        for t, (df, _ttf) in stats.items()
    }
    trie = build_phrase_trie(q)
    texts = {
        r["doc_id"]: r["text"]
        for r in searcher.fetch(top, columns=["text"]).collect()
    }
    for doc_id, row in out.items():
        _, best, frags = highlight_document(
            texts[doc_id], trie, frag_char_size=4096, weighted=True, term_weights=tw
        )
        assert row["frag_score"] == pytest.approx(best, rel=0, abs=0)
        assert list(row["fragments"]) == frags


def test_mixed_case_and_nonascii_offsets():
    """Tokenization runs on the ORIGINAL string (not str.lower(), whose
    length can differ — 'İ'.lower() is 2 chars), so tags land on the right
    characters and preserve original casing."""
    from lucene_solr_spark.operators.fvh import build_phrase_trie, highlight_document

    trie = build_phrase_trie([(("hello",), 1.0)])
    n, b, frags = highlight_document(
        "Hello WORLD İstanbul hello again", trie, frag_char_size=4096
    )
    assert n == 1 and b == 2.0
    assert frags == ["<b>Hello</b> WORLD İstanbul <b>hello</b> again"]
