"""SpellCheckCollator: suggestion substitution + hit verification, brute-
forced against the oracle's postings."""

import itertools

import pytest


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


def brute_collate(oracle, words, max_sugg=3, max_tries=10, max_coll=3, max_edits=2):
    options = []
    misspelled = False
    for w in words:
        if w in oracle.postings:
            options.append([w])
            continue
        misspelled = True
        cand = [
            (t, _lev(t, w), len(ds))
            for t, ds in oracle.postings.items()
            if t != w and _lev(t, w) <= max_edits
        ]
        cand.sort(key=lambda x: (x[1], -x[2], x[0]))
        if not cand:
            return []
        options.append([t for t, _, _ in cand[:max_sugg]])
    if not misspelled:
        return []
    rows = []
    for c in itertools.islice(itertools.product(*options), max_tries):
        docsets = [set(oracle.postings[w]) for w in set(c)]
        hits = len(set.intersection(*docsets))
        rows.append((" ".join(c), hits))
    rows = [r for r in rows if r[1] > 0]
    rows.sort(key=lambda r: -r[1])
    return rows[:max_coll]


def test_collation_matches_brute(searcher, oracle):
    got = [(r["collation"], r["hits"]) for r in searcher.spellcheck_collate(["wulozz", "ge0"]).collect()]
    want = brute_collate(oracle, ["wulozz", "ge0"])
    assert got == want and got


def test_all_correct_returns_empty(searcher):
    assert searcher.spellcheck_collate(["wuloze", "ge0"]).collect() == []


def test_unfixable_word_returns_empty(searcher):
    assert searcher.spellcheck_collate(["qqqqqqqqqqqq", "ge0"]).collect() == []
