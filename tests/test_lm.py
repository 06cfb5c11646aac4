"""bigram_logprob vs a brute-force python/numpy oracle (same add-one
smoothing, same float32 2^-20 fixed-point quantization)."""

import math
import random
from collections import Counter

import numpy as np

from lucene_solr_spark.operators.lm import bigram_logprob


def brute(texts):
    toks = {d: t.split(" ") for d, t in texts.items()}
    vocab = {w for t in toks.values() for w in t}
    v = len(vocab)
    c12 = Counter()
    c1 = Counter()
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    out = {}
    for d, t in toks.items():
        if len(t) < 2:
            continue
        s = 0
        n = 0
        for a, b in zip(t, t[1:]):
            p = (c12[(a, b)] + 1.0) / (c1[a] + float(v))
            s += math.floor(float(np.float32(math.log(p))) * 1048576)
            n += 1
        out[d] = (n, s)
    return out


def _run(spark, texts):
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    return {
        r.doc_id: (r.n_bigrams, r.logprob_q) for r in bigram_logprob(df).collect()
    }


def test_small_corpus_exact(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the cat ran",
        2: "a dog sat on a log",
        3: "single",
    }
    got = _run(spark, texts)
    want = brute(texts)
    assert got == want
    assert 3 not in got  # < 2 tokens


def test_repeated_docs_score_higher(spark):
    """A doc made of corpus-frequent bigrams must average higher log-prob
    than a doc of unique bigrams."""
    common = "alpha beta gamma delta"
    texts = {i: common for i in range(8)}
    texts[8] = "zeta eta theta iota"
    got = _run(spark, texts)
    avg = {d: s / n for d, (n, s) in got.items()}
    assert avg[0] > avg[8]
    assert got == brute(texts)


def test_random_corpus_matches_brute(spark):
    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        d: " ".join(rnd.choice(vocab) for _ in range(rnd.randint(2, 40)))
        for d in range(25)
    }
    assert _run(spark, texts) == brute(texts)
