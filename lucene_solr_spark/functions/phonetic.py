"""American Soundex encoder (reference ``lucene/analysis/phonetic/src/java/
org/apache/lucene/analysis/phonetic/PhoneticFilter.java`` with the
commons-codec ``Soundex`` encoder — ``PhoneticFilterFactory`` registers it
under ``encoder="Soundex"``).

Semantics (commons-codec US_ENGLISH Soundex):

1. keep the first letter;
2. map letters to code digits — b f p v -> 1, c g j k q s x z -> 2,
   d t -> 3, l -> 4, m n -> 5, r -> 6; vowels (a e i o u y) separate;
3. consonants from the same code group separated ONLY by h or w are coded
   once (the HW rule); separated by a vowel they are coded again;
4. adjacent same-code consonants (including the first letter's group)
   collapse to one digit;
5. the code is first letter + first 3 digits, zero-padded.

Implemented as a fixed sequence of string substitutions over an intermediate
alphabet (vowels -> '0', h/w -> '9' markers) so the EXACT same pass sequence
is replayable in ANSI SQL (``soundex_sql_expr``) — the engine and the DuckDB
oracle run literally the same rewrite system, so agreement is bitwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["SOUNDEX_MAPPING", "soundex", "soundex_batch", "soundex_sql_expr"]

# code per letter a..z: vowels+y -> 0, h/w -> 9 (separator marker)
SOUNDEX_MAPPING = "01230129022455012623019202"
_ALPHA = "abcdefghijklmnopqrstuvwxyz"
assert len(SOUNDEX_MAPPING) == 26

# iterated-substitution schedule, applied IN ORDER (each entry applied
# `passes` times; non-overlapping left-to-right replace semantics — identical
# in Python str.replace and SQL replace()):
#   1. collapse runs of 9 markers;     2. HW rule: d9d -> d;
#   3. collapse same-code runs (incl. the first letter's group)
_PASSES_RUN = 6  # handles runs up to 2^6 long — far beyond the 32-byte terms


def _rewrite(code: str) -> str:
    for _ in range(_PASSES_RUN):
        code = code.replace("99", "9")
    for _ in range(_PASSES_RUN):
        for d in "123456":
            code = code.replace(f"{d}9{d}", d)
    for _ in range(_PASSES_RUN):
        for d in "0123456":
            code = code.replace(f"{d}{d}", d)
    return code


_TRANS = str.maketrans(_ALPHA, SOUNDEX_MAPPING)
_CLEAN = str.maketrans("", "", "0123456789")


def soundex(word: str) -> str:
    """4-char code (lowercase head letter + 3 digits), '' for empty input."""
    w = word.lower().translate(_CLEAN)
    w = "".join(ch for ch in w if "a" <= ch <= "z")
    if not w:
        return ""
    code = _rewrite(w.translate(_TRANS))
    digits = code[1:].replace("0", "").replace("9", "")
    return w[0] + (digits + "000")[:3]


def soundex_batch(terms) -> np.ndarray:
    """Vectorized over a term dictionary (pandas str ops, no per-row UDF)."""
    s = pd.Series(terms, dtype=object).fillna("")
    s = s.str.lower().str.replace(r"[^a-z]", "", regex=True)
    code = s.str.translate(_TRANS)
    for _ in range(_PASSES_RUN):
        code = code.str.replace("99", "9", regex=False)
    for _ in range(_PASSES_RUN):
        for d in "123456":
            code = code.str.replace(f"{d}9{d}", d, regex=False)
    for _ in range(_PASSES_RUN):
        for d in "0123456":
            code = code.str.replace(f"{d}{d}", d, regex=False)
    digits = (code.str.slice(1).str.replace("0", "", regex=False).str.replace("9", "", regex=False) + "000").str.slice(0, 3)
    out = s.str.slice(0, 1) + digits
    out = out.where(s.str.len() > 0, "")
    return out.to_numpy(dtype=object)


def soundex_sql_expr(col: str) -> str:
    """ANSI-SQL expression computing :func:`soundex` of ``col`` — the same
    mapping and iterated-replace schedule, so DuckDB reproduces the engine
    bitwise (used by the driver-contract oracle)."""
    w = f"regexp_replace(lower({col}), '[^a-z]', '', 'g')"
    code = f"translate({w}, '{_ALPHA}', '{SOUNDEX_MAPPING}')"
    for _ in range(_PASSES_RUN):
        code = f"replace({code}, '99', '9')"
    for _ in range(_PASSES_RUN):
        for d in "123456":
            code = f"replace({code}, '{d}9{d}', '{d}')"
    for _ in range(_PASSES_RUN):
        for d in "0123456":
            code = f"replace({code}, '{d}{d}', '{d}')"
    digits = f"substr(replace(replace(substr({code}, 2), '0', ''), '9', '') || '000', 1, 3)"
    return f"CASE WHEN length({w}) = 0 THEN '' ELSE substr({w}, 1, 1) || {digits} END"
