"""Soundex encoder: known codes, a naive reference implementation, and
three-way parity (scalar / batch / SQL) under hypothesis-generated input."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.functions.phonetic import (
    soundex,
    soundex_batch,
    soundex_sql_expr,
)

KNOWN = {
    # classic published American Soundex examples
    "Robert": "r163",
    "Rupert": "r163",
    "Ashcraft": "a261",
    "Ashcroft": "a261",
    "Tymczak": "t522",
    "Pfister": "p236",
    "Honeyman": "h555",
    "Jackson": "j250",
    "Washington": "w252",
    "Lee": "l000",
    "Gutierrez": "g362",
    "Wu": "w000",
    "": "",
    "42": "",
}


def _naive_soundex(word: str) -> str:
    """Direct per-letter transcription of the commons-codec algorithm."""
    codes = dict(zip("abcdefghijklmnopqrstuvwxyz", "01230129022455012623019202"))
    w = [c for c in word.lower() if "a" <= c <= "z"]
    if not w:
        return ""
    out = []
    last = codes[w[0]]  # the first letter's group participates in collapsing
    for ch in w[1:]:
        c = codes[ch]
        if c == "9":
            continue  # h/w: transparent — last code survives across it
        if c == "0":
            last = "0"  # vowel: resets the group
            continue
        if c != last:
            out.append(c)
        last = c
    return w[0] + ("".join(out) + "000")[:3]


def test_known_codes():
    for w, e in KNOWN.items():
        assert soundex(w) == e, w


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122), max_size=24))
def test_soundex_matches_naive_reference(word):
    assert soundex(word) == _naive_soundex(word)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=20), max_size=30))
def test_batch_and_sql_parity(words):
    got_batch = list(soundex_batch(words))
    assert got_batch == [soundex(w) for w in words]
    if words:
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT {soundex_sql_expr('t')} FROM (SELECT unnest(?) AS t)", [words]
        ).fetchall()
        assert [r[0] for r in rows] == [soundex(w) for w in words]


def test_phonetic_terms_engine(searcher, oracle):
    got = [(r["term"], r["df"]) for r in searcher.phonetic_terms("kee", 10).collect()]
    expect = sorted(
        ((t, len(p)) for t, p in oracle.postings.items() if soundex(t) == soundex("kee")),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == expect
    assert got, "fixture vocabulary must contain a k00-sounding term (key)"
