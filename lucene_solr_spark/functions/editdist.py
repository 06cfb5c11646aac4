"""Edit distances for fuzzy-term expansion.

``levenshtein`` — classic (insert/delete/substitute).
``osa`` — optimal string alignment: adjacent transposition counts as ONE
edit, matching the reference's fuzzy matching (``FuzzyQuery.
defaultTranspositions``; the ``LevenshteinAutomata`` transposition tables).
``osa(a, b) >= levenshtein(a, b) / 2`` (a transposition replaces at most two
classic edits), so a ``levenshtein <= 2*k`` term-dictionary pre-filter is a
safe superset for ``osa <= k``.
"""
from __future__ import annotations

__all__ = ["levenshtein", "osa"]


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def osa(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        for j in range(1, lb + 1):
            c = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                c = min(c, prev2[j - 2] + 1)
            cur.append(c)
        prev2, prev = prev, cur
    return prev[-1]
