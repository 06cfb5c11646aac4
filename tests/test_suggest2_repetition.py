"""Infix suggest, word-break spellcheck, and repetition stats."""

import pandas as pd


def test_infix_suggest(searcher, oracle):
    got = [(r["term"], r["df"]) for r in searcher.infix_suggest("or", 10).collect()]
    expect = sorted(
        ((t, len(p)) for t, p in oracle.postings.items() if "or" in t),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == expect and got


def test_word_break(searcher, oracle):
    # a run-on of the two most frequent terms must split at their boundary
    by_df = sorted(oracle.postings.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    w1, w2 = by_df[0][0], by_df[1][0]
    word = w1 + w2
    expect = []
    for i in range(1, len(word)):
        a, b = word[:i], word[i:]
        if a in oracle.postings and b in oracle.postings:
            expect.append((a, b, len(oracle.postings[a]) + len(oracle.postings[b]), i))
    expect.sort(key=lambda r: (-r[2], r[3]))
    got = [
        (r["left_term"], r["right_term"], r["freq_sum"])
        for r in searcher.word_break(word, 5).collect()
    ]
    assert got == [(a, b, s) for a, b, s, _ in expect[:5]]
    assert (w1, w2) in [(a, b) for a, b, _ in got]
    # unsplittable garbage: empty result, stable schema
    assert searcher.word_break("zzqqxx", 5).collect() == []


def test_repetition_stats_brute_force(spark):
    import re

    from lucene_solr_spark.functions.textstats import repetition_stats

    rows = [
        (0, "a b a b a"),          # heavy bigram repetition
        (1, "all distinct words"),
        (2, ""),                    # empty
        (3, "one"),                 # single token: no bigrams
        (4, "x x x x"),             # one unigram repeated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}

    for doc_id, text in rows:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        n, u = len(toks), len(set(toks))
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        exp_dup = 0 if n == 0 else (n - u) * 1000000 // n
        exp_top = 0 if n < 2 else max(bgs.count(x) for x in set(bgs)) * 1000000 // (n - 1)
        g = got[doc_id]
        assert (g["n_tokens"], g["n_unique"]) == (n, u), doc_id
        assert g["dup_unigram_q"] == exp_dup, doc_id
        assert g["top_bigram_q"] == exp_top, doc_id
