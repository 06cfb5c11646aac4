"""Classic query-parser grammar tests (QueryParser.jj subset)."""

from lucene_solr_spark.functions.analysis import standard_analyzer
from lucene_solr_spark.plans.parser import parse_query
from lucene_solr_spark.plans.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

AN = standard_analyzer()


def P(s):
    return parse_query(s, AN)


def test_single_term_and_normalize():
    assert P("Hello") == TermQuery("hello")


def test_bool_default_or():
    q = P("alpha beta")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == ["SHOULD", "SHOULD"]


def test_plus_minus_and():
    q = P("+alpha -beta gamma")
    assert [c.occur for c in q.clauses] == ["MUST", "MUST_NOT", "SHOULD"]
    q2 = P("alpha AND beta")
    assert [c.occur for c in q2.clauses] == ["MUST", "MUST"]


def test_phrase_and_boost():
    q = P('"big data"^2.5')
    assert isinstance(q, BoostQuery) and q.boost == 2.5
    assert q.query == PhraseQuery(("big", "data"))


def test_prefix_vs_wildcard():
    assert P("sca*") == PrefixQuery("sca")
    assert P("s?an") == WildcardQuery("s?an")
    assert P("s*n") == WildcardQuery("s*n")


def test_fuzzy():
    assert P("scann~1") == FuzzyQuery("scann", max_edits=1)
    assert P("scann~") == FuzzyQuery("scann", max_edits=2)


def test_range():
    assert P("[scan TO sort]") == TermRangeQuery("scan", "sort", True, True)
    assert P("{scan TO sort}") == TermRangeQuery("scan", "sort", False, False)
    assert P("[scan TO *]") == TermRangeQuery("scan", None, True, True)


def test_nested_group():
    q = P("+(alpha beta) -gamma")
    assert q.clauses[0].occur == "MUST" and isinstance(q.clauses[0].query, BooleanQuery)
    assert q.clauses[1].occur == "MUST_NOT"
