"""Block join (ToParentBlockJoinQuery full ScoreMode set + ToChildBlockJoin).

Brute-force control: exhaustive child scores rolled up per conv_id in pandas
with the reference's accumulate-in-double / single-f32-cast semantics
(ToParentBlockJoinQuery.java:322-354); child inheritance for ToChild.
"""

import numpy as np
import pytest

from lucene_solr_spark.plans.query import TermQuery

TERM = "wuloze"


@pytest.fixture(scope="module")
def corpus_pdf(spark_corpus):
    return spark_corpus.select("doc_id", "conv_id").toPandas()


def _child_scores(searcher, term):
    stats = searcher._term_stats({term})
    return searcher._evaluate(TermQuery(term), 1.0, stats).toPandas()


def _brute_parent(searcher, corpus_pdf, term, score_mode, k):
    j = _child_scores(searcher, term).merge(corpus_pdf, on="doc_id")
    rows = []
    for pk, g in j.groupby("conv_id"):
        s = g["score"].astype(np.float64)
        if score_mode == "none":
            sc = np.float32(0.0)
        elif score_mode == "total":
            sc = np.float32(s.sum())
        elif score_mode == "avg":
            sc = np.float32(s.sum() / len(s))
        elif score_mode == "min":
            sc = np.float32(g["score"].min())
        else:
            sc = np.float32(g["score"].max())
        rows.append((pk, len(g), float(sc)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:k]


@pytest.mark.parametrize("score_mode", ["max", "min", "total", "avg", "none"])
def test_block_join_score_modes(searcher, corpus_pdf, score_mode):
    got = searcher.block_join_topk(TermQuery(TERM), "conv_id", score_mode, 15).collect()
    want = _brute_parent(searcher, corpus_pdf, TERM, score_mode, 15)
    assert len(got) == len(want) > 0
    assert [(r["parent"], r["n_hits"]) for r in got] == [(p, n) for p, n, _ in want]
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_to_child_inherits_parent_score(searcher, corpus_pdf):
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.to_child_block_join(TermQuery(TERM), "conv_id", k=25).df.collect()
    ]
    pdoc = corpus_pdf.groupby("conv_id")["doc_id"].min().rename("pdoc").reset_index()
    sc = _child_scores(searcher, TERM).merge(
        pdoc, left_on="doc_id", right_on="pdoc"
    )[["conv_id", "pdoc", "score"]]
    ch = corpus_pdf.merge(sc, on="conv_id")
    ch = ch[ch["doc_id"] != ch["pdoc"]]
    ch = ch.sort_values(["score", "doc_id"], ascending=[False, True]).head(25)
    want = list(zip(ch["doc_id"].tolist(), ch["score"].astype(np.float32).tolist()))
    assert len(got) == len(want) > 0
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_array_equal([s for _, s in got], [s for _, s in want])


def test_to_child_no_scores_path(searcher):
    td = searcher.to_child_block_join(TermQuery(TERM), "conv_id", k=5, do_scores=False)
    rows = td.df.collect()
    assert rows and all(r["score"] == 0.0 for r in rows)
