"""Query-time join (JoinUtil / GlobalOrdinalsWithScoreQuery analog).

Brute-force control: score the from-query exhaustively, aggregate per join
value in pandas, re-score the to side, compare doc-for-doc.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.plans.query import TermQuery


def _brute(searcher, corpus_pdf, term, score_mode, k):
    stats = searcher._term_stats({term})
    scored = searcher._evaluate(TermQuery(term), 1.0, stats).toPandas()
    j = scored.merge(corpus_pdf[["doc_id", "conv_id"]], on="doc_id")
    if score_mode == "none":
        vals = pd.DataFrame({"conv_id": j["conv_id"].unique()})
        vals["score"] = np.float32(1.0)
    elif score_mode in ("max", "min"):
        vals = j.groupby("conv_id")["score"].agg(score_mode).astype(np.float32).reset_index()
    elif score_mode == "total":
        vals = j.groupby("conv_id")["score"].agg(lambda s: np.float32(np.sum(s.astype(np.float64)))).reset_index()
    else:  # avg
        vals = j.groupby("conv_id")["score"].agg(lambda s: np.float32(np.mean(s.astype(np.float64)))).reset_index()
    out = corpus_pdf[["doc_id", "conv_id"]].merge(vals, on="conv_id")
    out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
    return list(zip(out["doc_id"].tolist(), out["score"].astype(np.float32).tolist()))


@pytest.fixture(scope="module")
def corpus_pdf(spark_corpus):
    return spark_corpus.select("doc_id", "conv_id").toPandas()


@pytest.mark.parametrize("score_mode", ["max", "min", "total", "avg", "none"])
def test_join_query_score_modes(searcher, corpus_pdf, score_mode):
    got = searcher.join_query(TermQuery("wuloze"), "conv_id", "conv_id", score_mode, 15).collect()
    want = _brute(searcher, corpus_pdf, "wuloze", score_mode, 15)
    assert [d for d, _ in got] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=0 if score_mode in ("max", "min", "none") else 1e-6
    )


def test_join_query_none_is_constant(searcher):
    got = searcher.join_query(TermQuery("wuloze"), "conv_id", "conv_id", "none", 5).collect()
    assert got and all(s == 1.0 for _, s in got)


def test_join_query_unknown_mode(searcher):
    with pytest.raises(ValueError):
        searcher.join_query(TermQuery("wuloze"), "conv_id", "conv_id", "median", 5)
