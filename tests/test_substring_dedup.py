"""duplicated_spans (Lee et al. 2022 exact-substring dedup analog) vs a
brute-force python oracle: duplicated k-gram positions, overlap/adjacency
merging, within-doc self-repetition."""

import random
from collections import Counter

from lucene_solr_spark.operators.dedup import duplicated_spans


def brute_spans(texts, k):
    toks = {d: t.split(" ") for d, t in texts.items()}
    grams = Counter()
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            grams[tuple(t[i : i + k])] += 1
    out = {}
    for d, t in toks.items():
        pos = [
            i
            for i in range(len(t) - k + 1)
            if grams[tuple(t[i : i + k])] >= 2
        ]
        spans = []
        for p in pos:
            if spans and p - spans[-1][1] <= k:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        out[d] = [(s, e + k - s) for s, e in spans]
    return {d: v for d, v in out.items() if v}


def _run(spark, texts, k):
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = duplicated_spans(df, k=k).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    return {d: sorted(v) for d, v in got.items()}


def test_cross_doc_boilerplate_and_unique_docs(spark):
    boiler = " ".join(f"b{i}" for i in range(12))
    texts = {
        0: "u0 u1 u2 " + boiler + " t0 t1",
        1: "v0 " + boiler + " v1 v2 v3 v4",
        2: " ".join(f"w{i}" for i in range(25)),  # all unique: no spans
    }
    k = 8
    assert _run(spark, texts, k) == brute_spans(texts, k)


def test_within_doc_repetition_counts_as_duplicate(spark):
    rep = " ".join(f"r{i}" for i in range(9))
    texts = {0: rep + " x0 x1 x2 " + rep + " y0", 1: "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"}
    k = 9
    got = _run(spark, texts, k)
    assert got == brute_spans(texts, k)
    assert 0 in got and 1 not in got


def test_adjacent_and_overlapping_spans_merge(spark):
    # doc 0's tokens [0,10) match doc 1 and [5,15) match doc 2: the two
    # duplicated windows overlap, so they must merge into one maximal span
    toks0 = [f"a{i}" for i in range(15)]
    texts = {
        0: " ".join(toks0) + " " + " ".join(f"g{i}" for i in range(5)),
        1: " ".join(toks0[0:10]) + " " + " ".join(f"p{i}" for i in range(15)),
        2: " ".join(toks0[5:15]) + " " + " ".join(f"q{i}" for i in range(15)),
    }
    k = 10
    got = _run(spark, texts, k)
    assert got == brute_spans(texts, k)
    assert got[0] == [(0, 15)]  # merged: one span covering tokens [0, 15)


def test_random_mutated_corpus_matches_brute(spark):
    rnd = random.Random(42)
    vocab = [f"t{i}" for i in range(40)]
    base = [rnd.choice(vocab) for _ in range(60)]
    texts = {}
    for d in range(20):
        t = list(base)
        # mutate a few tokens so duplication is partial
        for _ in range(rnd.randint(0, 12)):
            t[rnd.randrange(len(t))] = rnd.choice(vocab)
        if rnd.random() < 0.3:
            t = t[: rnd.randint(20, 60)]
        texts[d] = " ".join(t)
    k = 10
    assert _run(spark, texts, k) == brute_spans(texts, k)


def test_short_docs_skipped(spark):
    texts = {0: "a b c", 1: "a b c"}
    assert _run(spark, texts, 5) == {}
