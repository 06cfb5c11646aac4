"""lucene/classification analogs: naive Bayes (exact brute-force parity in
both the float64 reference formulation and the quantized contract path) and
the kNN MLT-vote classifier.
"""

import math

import numpy as np
import pytest

from lucene_solr_spark.operators.classify import (
    KNearestNeighborClassifier,
    Q_SCALE,
    SimpleNaiveBayesClassifier,
)


@pytest.fixture(scope="module")
def nb(index8, spark_corpus):
    return SimpleNaiveBayesClassifier(index8, spark_corpus, "role")


@pytest.fixture(scope="module")
def brute_model(spark_corpus, index8):
    pdf = spark_corpus.select("doc_id", "text", "role").toPandas()
    analyzer = index8.config.analyzer
    toks = {r.doc_id: list(analyzer.tokens(r.text)) for r in pdf.itertuples()}
    cls_of = dict(zip(pdf["doc_id"], pdf["role"]))
    classes = sorted(set(cls_of.values()))
    df_c = {c: sum(1 for v in cls_of.values() if v == c) for c in classes}
    n_labeled = len(cls_of)
    hits: dict = {}
    for d, ts in toks.items():
        for w in set(ts):
            hits[(w, cls_of[d])] = hits.get((w, cls_of[d]), 0) + 1
    n_pairs = sum(len(set(ts)) for ts in toks.values())
    avg_unique = n_pairs / len(toks)
    den = {c: avg_unique * df_c[c] + n_labeled for c in classes}
    return toks, cls_of, classes, df_c, n_labeled, hits, den


def _brute_double(brute_model, doc_id):
    toks, _, classes, df_c, n_labeled, hits, den = brute_model
    out = {}
    for c in classes:
        s = math.log(df_c[c]) - math.log(n_labeled)
        for w in toks[doc_id]:
            s += math.log((hits.get((w, c), 0) + 1) / den[c])
        out[c] = s
    return out


def _brute_quant(brute_model, doc_id):
    toks, _, classes, df_c, n_labeled, hits, den = brute_model

    def q(x):
        return math.floor(float(np.float32(x)) * Q_SCALE)

    out = {}
    for c in classes:
        s = q(math.log(df_c[c]) - math.log(n_labeled))
        for w in toks[doc_id]:
            s += q(math.log((hits.get((w, c), 0) + 1) / den[c]))
        out[c] = s
    return out


def test_nb_scores_double_parity(nb, brute_model, spark):
    sample = spark.range(6).selectExpr("id * 37 as doc_id")
    got = {
        (r["doc_id"], r["cls"]): r["score"]
        for r in nb.scores(sample, quantized=False).collect()
    }
    for d in range(0, 6 * 37, 37):
        want = _brute_double(brute_model, d)
        for c, v in want.items():
            assert got[(d, c)] == pytest.approx(v, rel=1e-9)


def test_nb_scores_quantized_exact(nb, brute_model, spark):
    sample = spark.range(6).selectExpr("id * 41 as doc_id")
    got = {
        (r["doc_id"], r["cls"]): r["score"]
        for r in nb.scores(sample, quantized=True).collect()
    }
    for d in range(0, 6 * 41, 41):
        want = _brute_quant(brute_model, d)
        for c, v in want.items():
            assert got[(d, c)] == v, (d, c)


def test_nb_classify_argmax(nb, brute_model, spark):
    sample = spark.range(5).selectExpr("id * 53 as doc_id")
    got = {r["doc_id"]: r["cls"] for r in nb.classify(sample).collect()}
    for d in range(0, 5 * 53, 53):
        want = _brute_quant(brute_model, d)
        best = min(want.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[d] == best


def test_knn_classifier_vote(searcher, spark_corpus):
    knn = KNearestNeighborClassifier(searcher, "role", k=8)
    res = knn.classify_doc(3)
    assert res is not None
    cls, score = res
    # control: recompute the vote from the raw neighbour list
    mlt = searcher.more_like_this(3, 5)
    top = searcher.search(mlt, 8, exclude_doc_ids=[3]).df
    hits = top.join(
        spark_corpus.selectExpr("doc_id", "role as cls"), "doc_id"
    ).select("cls", "score").collect()
    mx = max(h["score"] for h in hits)
    agg: dict = {}
    for h in hits:
        agg[h["cls"]] = agg.get(h["cls"], 0.0) + h["score"] / mx
    scores = {c: v / 8 for c, v in agg.items()}
    if len(hits) < 8:
        scores = {c: v * 8 / len(hits) for c, v in scores.items()}
    want = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    assert (cls, pytest.approx(score)) == want
