"""AnalyzingSuggester / FuzzySuggester / BlendedInfixSuggester semantics."""

import pytest

from lucene_solr_spark.functions.analysis import simple_analyzer
from lucene_solr_spark.operators.suggesters import (
    AnalyzingSuggester,
    FuzzySuggester,
    blended_infix_lookup,
)


@pytest.fixture(scope="module")
def entries(spark):
    rows = [
        ("spark scan", 30),
        ("spark merge", 20),
        ("Spark", 50),
        ("scan the table", 8),
        ("merge join", 5),
        ("scan", 3),
        ("stan lee", 40),
        ("big data scan", 7),
    ]
    return spark.createDataFrame(rows, "surface string, weight long")


def test_analyzing_prefix_and_exact_first(spark, entries):
    s = AnalyzingSuggester.build(entries, simple_analyzer())
    got = [(r["surface"], r["weight"]) for r in s.lookup("spark", 5).collect()]
    # exact key "spark" first despite multi-entry completions; then weight desc
    assert got == [("Spark", 50), ("spark scan", 30), ("spark merge", 20)]
    # analyzed matching: query is lowercased like the entries
    got2 = [r["surface"] for r in s.lookup("SCAN", 5).collect()]
    assert got2 == ["scan", "scan the table"]


def test_fuzzy_lookup_edits_and_anchors(spark, entries):
    s = FuzzySuggester.build(entries, simple_analyzer())
    # "scam" -> "scan ..." within 1 edit; "stan lee" is 2 edits away
    # (t->c and n->m) so it must NOT match
    got = [r["surface"] for r in s.lookup("scam", 5).collect()]
    assert got == ["scan the table", "scan"]
    # one in-prefix edit: "spork" -> "spark ..." (a->o substitution)
    got_sp = [r["surface"] for r in s.lookup("spork", 5).collect()]
    assert got_sp == ["Spark", "spark scan", "spark merge"]
    # first char is protected: "xcan" must NOT match anything
    assert s.lookup("xcan", 5).count() == 0
    # below minFuzzyLength the lookup is exact-prefix only
    assert [r["surface"] for r in s.lookup("sp", 5).collect()] == ["Spark", "spark scan", "spark merge"]
    got_exact = [r["surface"] for r in s.lookup("spark sc", 5).collect()]
    assert got_exact == ["spark scan"]


def test_blended_infix_positions(spark, entries):
    s = AnalyzingSuggester.build(entries, simple_analyzer())
    got = {r["surface"]: r["score"] for r in blended_infix_lookup(s, "scan", 8).collect()}
    # prefix hits keep coefficient 1; weights < 10 pre-scale by 10
    assert got["scan the table"] == 80  # 8 -> 80, coef 1
    assert got["scan"] == 30  # 3 -> 30, coef 1
    # "spark scan": pos 1 -> coef 0.9; weight 30 stays (not < 10): 30*0.9 = 27
    assert got["spark scan"] == 27
    # "big data scan": pos 2 -> coef 0.8; 7 -> 70 * 0.8 = 56
    assert got["big data scan"] == 56
    assert "merge join" not in got


def test_blended_reciprocal(spark, entries):
    s = AnalyzingSuggester.build(entries, simple_analyzer())
    got = {r["surface"]: r["score"] for r in blended_infix_lookup(s, "scan", 8, blender="position_reciprocal").collect()}
    assert got["spark scan"] == 15  # 30 / (1+1)
    assert got["big data scan"] == 23  # 70 / 3 = 23.33 -> truncates
