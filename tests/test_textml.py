"""FeaturesSelectionStream / TextLogitStream analogs vs pure-Python controls."""

import math

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.operators.textml import igain_terms, text_logit


def _H(p):
    if p <= 0 or p >= 1:
        return 0.0
    return -p * math.log(p) - (1 - p) * math.log(1 - p)


@pytest.fixture(scope="module")
def brute_igain(spark_corpus, index8):
    pdf = spark_corpus.select("doc_id", "text", "role").toPandas()
    analyzer = index8.config.analyzer
    n = len(pdf)
    y = (pdf["role"] == "user").astype(int)
    npos = int(y.sum())
    ent_c = _H(npos / n)
    xc: dict = {}
    dfq: dict = {}
    for toks, yy in zip(pdf["text"].map(lambda t: set(analyzer.tokens(t))), y):
        for t in toks:
            dfq[t] = dfq.get(t, 0) + 1
            if yy:
                xc[t] = xc.get(t, 0) + 1
    out = {}
    for t, df in dfq.items():
        x = xc.get(t, 0)
        score = ent_c - ((df / n) * _H(x / df) + (1 - df / n) * _H((npos - x) / (n - df + 1)))
        out[t] = (score, df)
    return out, n


def test_igain_matches_brute_force(index8, spark_corpus, brute_igain):
    want, n = brute_igain
    got = igain_terms(index8, spark_corpus, "role", "user", top_n=15).collect()
    want_top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:15]
    assert [r["term"] for r in got] == [t for t, _ in want_top]
    for r, (t, (score, df)) in zip(got, want_top):
        assert r["score"] == pytest.approx(score, rel=1e-12)
        assert r["doc_freq"] == df
        assert r["idf"] == pytest.approx(math.log(n / (df + 1)), rel=1e-12)


def _py_logit(pdf, terms, iterations, alpha, n_docs):
    """Single-shard control: the reference SGD in doc_id order."""
    analyzer_tokens = pdf["toks"]
    dfreq = {t: sum(1 for ts in analyzer_tokens if t in ts) for t in terms}
    idfs = [math.log(n_docs / (dfreq[t] + 1)) for t in terms]
    w = np.ones(len(terms) + 1)
    errors = []
    lr = alpha
    last = None
    for _ in range(iterations):
        w0 = w.copy()
        err = 0.0
        for toks, y in zip(pdf["toks"], pdf["y"]):
            counts = {t: toks.count(t) for t in terms if t in toks}
            if not counts:
                continue
            v = np.zeros(len(terms) + 1)
            v[0] = 1.0
            for i, t in enumerate(terms):
                if t in counts:
                    v[i + 1] = idfs[i] * (1.0 + math.log(counts[t]))
            sig = 1.0 / (1.0 + math.exp(-float(v @ w)))
            sig0 = 1.0 / (1.0 + math.exp(-float(v @ w0)))
            err += abs(sig0 - y)
            w = w - (lr * (sig - y)) * v
        errors.append(err)
        if last is not None:
            lr = lr * 0.5 if last <= err else lr * 1.05
        last = err
    return w, errors


def test_text_logit_single_shard_exact(index8, spark_corpus):
    terms = ["wuloze", "qeli", "votele"]
    got = text_logit(index8, spark_corpus, terms, "role", "user", iterations=3, alpha=0.05, n_partitions=1)
    pdf = spark_corpus.select("doc_id", "text", "role").orderBy("doc_id").toPandas()
    pdf["toks"] = pdf["text"].map(lambda t: index8.config.analyzer.tokens(t))
    pdf["y"] = (pdf["role"] == "user").astype(float)
    w, errors = _py_logit(pdf, terms, 3, 0.05, len(pdf))
    np.testing.assert_allclose(got["weights"], w, rtol=1e-12)
    np.testing.assert_allclose(got["errors"], errors, rtol=1e-12)


def test_text_logit_learns_separable_signal(spark):
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index

    rng = np.random.RandomState(3)
    rows = []
    for i in range(200):
        pos = i % 2 == 0
        base = ["filler" + str(rng.randint(5))]
        if pos:
            base.append("signal")
        rows.append((i, " ".join(base), "yes" if pos else "no"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    corpus = spark.createDataFrame(pdf)
    idx = build_index(corpus, IndexConfig(n_partitions=4))
    res = text_logit(idx, corpus, ["signal", "filler0"], "label", "yes", iterations=25, alpha=0.5, n_partitions=4)
    assert res["weights"][1] > 1.0, "the separating feature must get a strong positive weight"
    assert res["errors"][-1] < res["errors"][0] * 0.5, "training error must drop"
