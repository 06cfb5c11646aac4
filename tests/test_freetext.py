"""FreeTextSuggester parity vs a pure-Python reference implementation of the
stupid-backoff lookup (FreeTextSuggester.java:408-580)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.analysis import simple_analyzer
from lucene_solr_spark.operators.freetext import ALPHA, FreeTextSuggester, _SCALE

DOCS = [
    "data scan runs fast and data scan runs again",
    "data scan beats data sort on big data sets",
    "slow sort beats no sort",
    "data spark data scan data spark",
    "scan scan scan",
]


def brute_counts(analyzer, grams):
    counts = Counter()
    for text in DOCS:
        toks = analyzer.tokens(text)
        for n in range(1, grams + 1):
            for i in range(len(toks) - n + 1):
                counts[(" ".join(toks[i : i + n]), n)] += 1
    return counts


def brute_lookup(analyzer, grams, key, num):
    counts = brute_counts(analyzer, grams)
    tot = sum(c for (g, n), c in counts.items() if n == 1)
    toks = analyzer.tokens(key)
    ended = not key[-1].isalnum()
    last = [None] * grams
    for g in range(grams):
        if len(toks) >= g + 1:
            last[g] = " ".join(toks[len(toks) - (g + 1) :])
    if ended:
        for i in range(grams - 1, 0, -1):
            if last[i - 1] is not None:
                last[i] = last[i - 1] + " "
        last[0] = ""
    backoff, seen, results = 1.0, set(), []
    for g in range(grams - 1, -1, -1):
        token = last[g]
        if token is None or (token == "" and len(key) > 0):
            continue
        cands = sorted(
            ((gr, c) for (gr, n), c in counts.items() if n == g + 1 and gr.startswith(token)),
            key=lambda t: (-t[1], t[0]),
        )
        if not cands:
            backoff *= ALPHA
            continue
        ctx = tot if g == 0 else counts[(" ".join(token.split(" ")[:g]), g)]
        taken = 0
        for gr, c in cands:
            w = gr.split(" ")[-1]
            if w in seen:
                continue
            seen.add(w)
            results.append((gr, ((_SCALE * backoff) * float(c)) / float(ctx)))
            taken += 1
            if taken >= num:
                break
        backoff *= ALPHA
    results.sort(key=lambda t: (-t[1], t[0]))
    return results[:num]


@pytest.fixture(scope="module")
def sugg(spark):
    corpus = spark.createDataFrame([(t,) for t in DOCS], "text string")
    return FreeTextSuggester.build(corpus, simple_analyzer(), grams=3)


def test_counts_match_brute(sugg):
    got = {(r["gram"], r["n"]): r["cnt"] for r in sugg.grams_df.collect()}
    exp = brute_counts(simple_analyzer(), 3)
    assert got == dict(exp)
    assert sugg.tot_tokens == sum(c for (g, n), c in exp.items() if n == 1)


@pytest.mark.parametrize(
    "key",
    [
        "data s",        # trigram context 'xxx data', prefix 's'
        "runs data s",   # full 3-token context
        "data scan ",    # lastTokenEnded: predict the next word
        "s",             # unigram-only
        "beats data sc", # deep context with sparse trigrams (backoff kicks in)
        "zzz s",         # unseen context word: trigram+bigram levels miss
    ],
)
def test_lookup_matches_brute(sugg, key):
    got = sugg.lookup(key, num=5)
    exp = brute_lookup(simple_analyzer(), 3, key, 5)
    assert got == exp, key


def test_seen_dedupe_prefers_higher_level(sugg):
    # 'data scan' exists as a bigram AND 'scan' as unigram: the bigram level
    # must win and the unigram completion of the same word must be blocked
    got = sugg.lookup("data sc", num=5)
    names = [g for g, _ in got]
    assert "data scan" in names
    assert "scan" not in names


def test_lookup_df_shape(spark, sugg):
    df = sugg.lookup_df(spark, "data s", num=4)
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
