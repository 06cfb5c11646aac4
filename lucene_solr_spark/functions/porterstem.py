"""Porter stemming (the classic 1980 algorithm with Porter's later revisions).

Behavior-compatible with the reference's ``PorterStemFilter`` /
``PorterStemmer`` (``reference lucene/analysis/common/src/java/org/apache/
lucene/analysis/en/PorterStemmer.java``), which implements Martin Porter's
original algorithm plus the two published departures the reference also
carries (step2 ``bli -> ble`` replacing ``abli -> able``, and the added
``logi -> log`` rule, ``PorterStemmer.java:307,330``).  Words shorter than
3 characters are returned unchanged (``PorterStemmer.java:476-480``).

Validated in ``tests/test_porter.py`` against the reference's own 23,531-word
test vocabulary (``porterTestData.zip`` voc.txt/output.txt).

Implemented from the published algorithm description (Porter, "An algorithm
for suffix stripping", Program 14(3) 1980), not translated from the Java.

The stemmer is per-word Python, but the analysis chain only ever applies it
to the *unique* terms of a batch (dictionary-encode first, stem the
dictionary, gather) — at 10^12-turn scale the unique-term dictionary per
Arrow batch is thousands of entries while the token stream is millions, so
the per-word cost is off the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["porter_stem", "porter_stem_unique"]

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m = number of VC sequences in the word ([C](VC)^m[V])."""
    n, i, ln = 0, 0, len(w)
    while i < ln and _is_cons(w, i):
        i += 1
    while i < ln:
        while i < ln and not _is_cons(w, i):
            i += 1
        if i >= ln:
            break
        n += 1
        while i < ln and _is_cons(w, i):
            i += 1
    return n


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _step1ab(w: str) -> str:
    # 1a: plurals
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-2]
        elif not w.endswith("ss"):
            w = w[:-1]
    # 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stripped = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stripped = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stripped = w[:-3]
        if stripped is not None:
            w = stripped
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    return w


# (suffix, replacement) — longest suffix wins, then the m-condition gates the
# rewrite (no fallback to a shorter suffix when the condition fails)
_STEP2 = sorted(
    [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),
    ],
    key=lambda p: -len(p[0]),
)

_STEP3 = sorted(
    [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ],
    key=lambda p: -len(p[0]),
)

_STEP4 = sorted(
    [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ],
    key=lambda s: -len(s),
)


def _step2(w: str) -> str:
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                return stem + rep
            return w
    return w


def _step3(w: str) -> str:
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                return stem + rep
            return w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (suf != "ion" or (stem and stem[-1] in "st")):
                return stem
            return w
    return w


def _step5(w: str) -> str:
    # 5a: drop final e
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # 5b: -ll -> -l when m > 1
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


def porter_stem(word: str) -> str:
    """Stem one lowercase word."""
    if len(word) <= 2:
        return word
    return _step5(_step4(_step3(_step2(_step1c(_step1ab(word))))))


def porter_stem_unique(uniques) -> np.ndarray:
    """Stem an array of unique terms (object dtype in, object dtype out)."""
    return np.array([porter_stem(u) for u in uniques], dtype=object)


def s_stem(word: str) -> str:
    """Harman S-stemmer — minimal English plural stripping, semantics of the
    reference's ``EnglishMinimalStemmer`` (``reference lucene/analysis/
    common/src/java/org/apache/lucene/analysis/en/EnglishMinimalStemmer.java``):
    only final-``s`` forms change; ``-ies`` → ``-y`` unless preceded by
    a/e; ``-us``/``-ss`` and vowel+``es`` forms are left alone."""
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    c2 = word[-2]
    if c2 in "us":
        return word
    if c2 == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in "ae":
            return word[:-3] + "y"
        if word[-3] in "iaoe":
            return word
        return word[:-1]
    return word[:-1]
