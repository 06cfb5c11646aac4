"""UnifiedHighlighter passage scoring (PassageScorer.java formulas) and
DefaultPassageFormatter output, verified against an independent recomputation
of the reference formulas."""

import math

import numpy as np
import pytest

from lucene_solr_spark.operators.highlight import (
    PassageScorer,
    _highlight_one,
    _sentences,
)


def _ref_weight(content_len, ttf, k1=1.2, pivot=87.0):
    nd = np.float32(1) + np.float32(content_len) / np.float32(pivot)
    return np.float32(np.float32(k1 + 1) * np.float32(math.log(1 + (float(nd) + 0.5) / (ttf + 0.5))))


def _ref_tf(freq, plen, k1=1.2, b=0.75, pivot=87.0):
    norm = np.float32(k1) * np.float32(np.float32(1 - b) + np.float32(b) * (np.float32(plen) / np.float32(pivot)))
    return np.float32(np.float32(freq) / (np.float32(freq) + norm))


def _ref_norm(start, pivot=87.0):
    return np.float32(np.float32(1) + np.float32(1) / np.float32(math.log(pivot + start)))


def test_sentences_spans():
    t = "alpha beta. gamma delta! epsilon"
    spans = _sentences(t)
    # BreakIterator semantics: a sentence span includes its trailing
    # whitespace (TestUnifiedHighlighter's snippet literals end in a space)
    assert [t[s:e] for s, e in spans] == ["alpha beta. ", "gamma delta! ", "epsilon"]
    assert _sentences("no boundary here") == [(0, 16)]


def test_single_passage_score_matches_reference_formulas():
    text = "scan merge scan value"
    sc, snip = _highlight_one(text, {"scan", "merge"}, PassageScorer(), 1)
    clen = len(text)
    want = np.float32(
        np.float32(
            np.float64(np.float32(_ref_tf(1, clen) * _ref_weight(clen, 1)))  # merge
            + np.float64(np.float32(_ref_tf(2, clen) * _ref_weight(clen, 2)))  # scan
        )
        * _ref_norm(0)
    )
    assert sc == pytest.approx(float(want), rel=0, abs=0)
    assert snip == "<b>scan</b> <b>merge</b> <b>scan</b> value"


def test_earlier_passage_scores_higher_all_else_equal():
    text = "scan alpha beta lorem. filler words here okay. scan alpha beta lorem."
    s = PassageScorer()
    sc, snip = _highlight_one(text, {"scan"}, s, 2)
    # both matching sentences selected, joined with ellipsis over the middle
    assert snip.count("<b>scan</b>") == 2
    assert "... " in snip
    # the earlier passage must carry the larger norm => larger per-passage score
    spans = _sentences(text)
    p0, p2 = spans[0], spans[2]
    sc0 = s.score({"scan": 1}, {"scan": 2}, p0[0], p0[1] - p0[0], len(text))
    sc2 = s.score({"scan": 1}, {"scan": 2}, p2[0], p2[1] - p2[0], len(text))
    assert sc0 > sc2
    assert sc == pytest.approx(float(sc0))


def test_top_passages_selection_and_order():
    # second sentence has 2 matches -> higher score, but formatting is in
    # document order when both are kept
    text = "scan one two three four five six seven. scan scan."
    sc, snip = _highlight_one(text, {"scan"}, PassageScorer(), 1)
    spans = _sentences(text)
    s = PassageScorer()
    sc1 = s.score({"scan": 1}, {"scan": 3}, spans[0][0], spans[0][1] - spans[0][0], len(text))
    sc2 = s.score({"scan": 2}, {"scan": 3}, spans[1][0], spans[1][1] - spans[1][0], len(text))
    assert sc == pytest.approx(float(max(sc1, sc2)))
    if sc2 > sc1:
        assert snip == "<b>scan</b> <b>scan</b>."


def test_no_match_summary_fallback():
    sc, snip = _highlight_one("plain sentence one. and two.", {"zzz"}, PassageScorer(), 1)
    assert sc == 0.0
    assert snip == "plain sentence one. "  # span includes trailing space
    assert "<b>" not in snip


def test_end_to_end_dataframe(searcher):
    from lucene_solr_spark.plans.query import TermQuery

    top = searcher.search(TermQuery("wuloze"), 10)
    out = searcher.highlight_unified(top, ["wuloze"], max_passages=1).collect()
    assert len(out) == 10
    for r in out:
        assert "<b>wuloze</b>" in r["snippet"]
        assert r["hl_score"] > 0


def test_query_argument_extracts_terms(searcher):
    from lucene_solr_spark.plans.query import BooleanQuery, TermQuery

    q = BooleanQuery.build(should=[TermQuery("wuloze"), TermQuery("ge0")])
    top = searcher.search(q, 5)
    out = searcher.highlight_unified(top, q).collect()
    assert len(out) == 5
    assert any("<b>" in r["snippet"] for r in out)
