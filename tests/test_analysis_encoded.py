"""Byte-level encoded tokenizer ≡ regex analysis chain, property-tested.

The index-build hot path uses Analyzer.analyze_batch_encoded (dictionary
codes straight from a numpy byte tokenizer); its contract is bit-identity
with the regex path AND with pd.factorize(sort=True) of the flat stream —
any drift would silently break BM25 rank-identity.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.functions.analysis import (
    Analyzer,
    english_analyzer,
    simple_analyzer,
    standard_analyzer,
)

ANALYZERS = [standard_analyzer(), simple_analyzer(), english_analyzer()]


def _assert_equiv(an: Analyzer, texts: pd.Series):
    flat, rows, dl, pos = an.analyze_batch_with_positions(texts)
    codes, uniques, rows2, dl2, pos2 = an.analyze_batch_encoded(texts)
    flat2 = np.asarray(uniques, dtype=object)[codes] if codes.size else np.empty(0, object)
    assert list(flat) == list(flat2)
    assert (rows == rows2).all() and (dl == dl2).all() and (pos == pos2).all()
    if len(flat):
        ref_codes, ref_uniq = pd.factorize(pd.Series(flat), sort=True)
        assert (codes == ref_codes).all()
        assert list(uniques) == list(ref_uniq)


def test_edge_cases_all_analyzers():
    cases = pd.Series(
        [
            "The quick brown fox",
            "don't can't won't it's",
            "a''b a'b'c x'",
            "'start end'",
            "",
            None,
            "   ",
            "ab_cd under_score",
            "x" * 300 + " ok",
            "y" * 33 + " fits-the-regex not-the-dict",  # forces fallback via width
            "123 456 foo7bar",
            "UPPER lower MiXeD",
            "a'",
            "'a",
            "''",
            "tab\tsep\nnewline",
        ]
    )
    for an in ANALYZERS:
        _assert_equiv(an, cases)


def test_non_ascii_and_nul_fallback():
    for an in ANALYZERS:
        _assert_equiv(an, pd.Series(["héllo wörld", "日本語 text", "naïve café", "ascii only"]))
        _assert_equiv(an, pd.Series(["with\x00nul", "plain"]))


def test_no_lowercase_variant():
    an = Analyzer(pattern=r"[^\W_]+(?:['’][^\W_]+)*", lowercase=False)
    _assert_equiv(an, pd.Series(["Mixed CASE keeps Case", "A'B a'b"]))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcXYZ012 '\t_-.,!", max_size=60),
        max_size=8,
    )
)
def test_random_ascii_property(texts):
    s = pd.Series(texts, dtype=object)
    for an in ANALYZERS:
        _assert_equiv(an, s)
