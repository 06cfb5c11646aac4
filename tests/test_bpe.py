"""BPE training + encoding vs brute-force classic implementations.

The brute encoder is the canonical GPT-2-style priority loop (repeatedly
merge the LOWEST-RANK pair present anywhere in the word), deliberately a
different algorithm from the operator's ascending-rank single-pass — for
learned merge tables the two are provably equivalent (any pair containing a
symbol created by merge r has rank > r), and the test pins that.
"""

from __future__ import annotations

import re

import pytest


def _brute_words(texts):
    out = []
    for t in texts:
        out.extend(re.findall(r"[a-z0-9]+", t.lower()))
    return out


def _brute_learn(texts, n_merges):
    """Classic corpus-level BPE learning, word-occurrence weighted."""
    words = [list(w) for w in _brute_words(texts)]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        nxt = []
        for syms in words:
            o, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    o.append(l + r)
                    i += 2
                else:
                    o.append(syms[i])
                    i += 1
            nxt.append(o)
        words = nxt
    return merges


def _brute_encode(word, merges):
    """Priority-loop encode: merge the lowest-rank pair present, repeat."""
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        pairs = [(rank[(syms[i], syms[i + 1])], i) for i in range(len(syms) - 1)
                 if (syms[i], syms[i + 1]) in rank]
        if not pairs:
            break
        best_rank = min(p[0] for p in pairs)
        l, r = merges[best_rank]
        o, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                o.append(l + r)
                i += 2
            else:
                o.append(syms[i])
                i += 1
        syms = o
    return syms


TEXTS = [
    "the lowest low lower lowering lowered",
    "new newer newest news renew renewal",
    "wide wider widest widely de der dest",
    "low low low lowest newer newer wide",
    "aaaa aaa aa a abab ababab ssss",  # repeat runs: overlap handling
    "",
]


def test_bpe_learn_matches_brute(spark):
    from lucene_solr_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_learn(docs, 12, max_word_types=None)
    want = _brute_learn(TEXTS, 12)
    assert got == want
    # determinism under a different partitioning
    assert bpe_learn(docs.repartition(7), 12, max_word_types=None) == want


def test_bpe_encode_matches_priority_loop(spark):
    from lucene_solr_spark.operators.bpe import bpe_encode_counts, bpe_learn

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe_learn(docs, 12, max_word_types=None)
    assert len(merges) == 12 and any(len(l) > 1 or len(r) > 1 for l, r in merges)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_counts(docs, merges).collect()
    }
    want = {}
    for i, t in enumerate(TEXTS):
        ws = _brute_words([t])
        if ws:
            want[i] = (len(ws), sum(len(_brute_encode(w, merges)) for w in ws))
    assert got == want


def test_bpe_pair_counts_brute(spark):
    from lucene_solr_spark.operators.bpe import bpe_pair_counts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs).collect()}
    want = {}
    for w in _brute_words(TEXTS):
        for i in range(len(w) - 1):
            want[w[i : i + 2]] = want.get(w[i : i + 2], 0) + 1
    assert got == want


def test_bpe_learn_cap_and_validation(spark):
    from lucene_solr_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame(
        [(0, "aa bb aa bb aa cc")], "doc_id long, text string"
    )
    # cap keeps the top word types by (cnt desc, word asc): with cap 1 only
    # 'aa' (3 occurrences) survives, so the first merge must be ('a', 'a')
    assert bpe_learn(docs, 1, max_word_types=1) == [("a", "a")]
    with pytest.raises(ValueError):
        bpe_learn(docs, -1)
