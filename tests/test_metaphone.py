"""DoubleMetaphone encoder + filter: golden vectors from the reference's own
DoubleMetaphoneFilterTest.java, published commons-codec pairs, and the
dictionary-matching searcher surface."""

import pytest

from lucene_solr_spark.functions.metaphone import dm_filter, double_metaphone
from lucene_solr_spark.operators.searcher import IndexSearcher


# reference golden vectors (DoubleMetaphoneFilterTest.java:23-62)
def test_reference_filter_vectors():
    assert dm_filter(["international"], 4, inject=False) == ["ANTR"]
    assert dm_filter(["international"], 4, inject=True) == ["international", "ANTR"]
    assert dm_filter(["Kuczewski"], 4, inject=False) == ["KSSK", "KXFS"]
    assert dm_filter(["international"], 8, inject=False) == ["ANTRNXNL"]
    assert dm_filter(["12345", "#$%@#^%&"], 8, inject=True) == ["12345", "#$%@#^%&"]
    assert dm_filter(["12345", "#$%@#^%&"], 8, inject=False) == ["12345", "#$%@#^%&"]
    assert dm_filter(["12345", "#$%@#^%&", "hello"], 8, inject=False) == ["12345", "#$%@#^%&", "HL"]


# published commons-codec DoubleMetaphone outputs
@pytest.mark.parametrize(
    "word,primary,alternate",
    [
        ("smith", "SM0", "XMT"),
        ("schmidt", "XMT", "SMT"),
        ("snider", "SNTR", "XNTR"),
        ("schneider", "XNTR", "SNTR"),
        ("jose", "HS", "HS"),
        ("thomas", "TMS", "TMS"),
        ("catherine", "K0RN", "KTRN"),
        ("katherine", "K0RN", "KTRN"),
        ("knight", "NT", "NT"),  # silent start KN
        ("wright", "RT", "RT"),  # silent start WR
        ("psycho", "SX", "SK"),  # silent start PS
        ("gnome", "NM", "NM"),  # silent start GN
        ("school", "SKL", "SKL"),
        ("michael", "MKL", "MXL"),
        ("filipowicz", "FLPT", "FLPF"),
        ("judge", "JJ", "AJ"),
        ("wasserman", "ASRM", "FSRM"),
        ("ghost", "KST", "KST"),
        ("caesar", "SSR", "SSR"),
        ("chianti", "KNT", "KNT"),
        ("island", "ALNT", "ALNT"),
        ("sugar", "XKR", "SKR"),
        ("xavier", "SF", "SFR"),
    ],
)
def test_commons_codec_pairs(word, primary, alternate):
    assert double_metaphone(word) == primary
    assert double_metaphone(word, alternate=True) == alternate


def test_empty_and_none():
    assert double_metaphone("") is None
    assert double_metaphone("   ") is None
    assert double_metaphone(None) is None
    assert dm_filter([], 4) == []


def test_code_length_cap():
    # codes never exceed max_code_len, and complete() stops the walk
    for n in (1, 2, 4, 8):
        p = double_metaphone("internationalization", n)
        assert len(p) <= n


def test_matched_variants_share_code():
    """The headline property: spelling variants collide on at least one code."""
    pairs = [("smith", "schmidt"), ("snider", "schneider"), ("catherine", "katherine")]
    for a, b in pairs:
        codes_a = {double_metaphone(a), double_metaphone(a, alternate=True)}
        codes_b = {double_metaphone(b), double_metaphone(b, alternate=True)}
        assert codes_a & codes_b, (a, b)


def test_searcher_double_metaphone_terms(index8, spark_corpus, oracle):
    s = IndexSearcher(index8, spark_corpus)
    # every corpus term matching itself: query any existing term, expect it
    term = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    got = s.double_metaphone_terms(term, n=20).toPandas()
    assert term in set(got["term"])
    # df ordering: non-increasing
    dfs = list(got["df"])
    assert dfs == sorted(dfs, reverse=True)
    # all returned terms share a code with the query
    targets = {double_metaphone(term), double_metaphone(term, alternate=True)} - {None, ""}
    for t in got["term"]:
        codes = {double_metaphone(t), double_metaphone(t, alternate=True)} - {None, ""}
        assert codes & targets, t
