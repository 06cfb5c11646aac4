"""Flexible (StandardQueryParser) grammar tests, mirroring the reference's
TestStandardQP / QueryParserTestBase assertions as parsed-AST equalities."""

import pytest

from lucene_solr_spark.functions.analysis import simple_analyzer
from lucene_solr_spark.plans.flexible_parser import parse_flexible_query
from lucene_solr_spark.plans.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FieldTermQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
)

A = simple_analyzer()


def p(s, op="OR"):
    return parse_flexible_query(s, A, default_operator=op)


def occurs(q):
    assert isinstance(q, BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_operator_vs_whitespace():
    """TestStandardQP.testOperatorVsWhitespace: a standalone +/-/! binds to
    the NEXT clause — 'a - b' == 'a -b', 'a + b' == 'a +b', 'a ! b' == 'a -b'."""
    assert p("a - b") == p("a -b")
    assert p("a + b") == p("a +b")
    assert p("a ! b") == p("a -b")
    assert occurs(p("a - b")) == [("SHOULD", TermQuery("a")), ("MUST_NOT", TermQuery("b"))]


def test_default_operator_or():
    """OR is the default (TestStandardQP.testDefaultOperator)."""
    assert occurs(p("a b")) == [("SHOULD", TermQuery("a")), ("SHOULD", TermQuery("b"))]
    # explicit AND promotes both neighbors
    assert occurs(p("a AND b")) == [("MUST", TermQuery("a")), ("MUST", TermQuery("b"))]


def test_default_operator_and():
    assert occurs(p("a b", op="AND")) == [("MUST", TermQuery("a")), ("MUST", TermQuery("b"))]
    # explicit OR demotes both neighbors back to SHOULD
    assert occurs(p("a OR b", op="AND")) == [
        ("SHOULD", TermQuery("a")), ("SHOULD", TermQuery("b"))
    ]
    # mixed: 'a b OR c' under AND — a required, b/c optional (OR-joined)
    assert occurs(p("a b OR c", op="AND")) == [
        ("MUST", TermQuery("a")), ("SHOULD", TermQuery("b")), ("SHOULD", TermQuery("c"))
    ]


class _QPAnalyzer:
    """qpAnalyzer analog (QueryParserTestBase): 'phrase' expands to two
    tokens; everything else is one token."""

    def tokens(self, text):
        out = []
        for t in text.lower().split():
            out += ["phrase1", "phrase2"] if t == "phrase" else [t]
        return out


def test_qpa_multi_token_group_follows_default_operator():
    """TestStandardQP.testQPA: AND default applies INSIDE the analyzed
    multi-token group — 'term phrase term' -> '+term +(+phrase1 +phrase2)
    +term' (the classic parser leaves the inner group SHOULD)."""
    qa = _QPAnalyzer()
    q = parse_flexible_query("term phrase term", qa, default_operator="AND")
    inner = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery("phrase1"), "MUST"),
            BooleanClause(TermQuery("phrase2"), "MUST"),
        )
    )
    assert occurs(q) == [
        ("MUST", TermQuery("term")), ("MUST", inner), ("MUST", TermQuery("term"))
    ]
    # OR default: inner group stays SHOULD (both parsers agree)
    q2 = parse_flexible_query("term phrase term", qa, default_operator="OR")
    assert occurs(q2)[1][1].clauses[0].occur == "SHOULD"


def test_regexp_clause():
    assert p("/[a-z]+/") == RegexpQuery("[a-z]+")
    assert p("/sc.n/^2") == BoostQuery(RegexpQuery("sc.n"), 2.0)


def test_not_keyword():
    assert p("a NOT b") == p("a -b")


def test_shared_classic_surface():
    """Inherited grammar: phrases, fields, boost, fuzzy, prefix."""
    assert p('"big scan"') == PhraseQuery(("big", "scan"))
    assert p("lang:en") == FieldTermQuery("lang", "en")
    assert p("scan^2") == BoostQuery(TermQuery("scan"), 2.0)
    assert p("scan~1") == FuzzyQuery("scan", max_edits=1)
    assert p("sca*") == PrefixQuery("sca")
    assert occurs(p("(a b) AND c"))[1] == ("MUST", TermQuery("c"))


def test_single_clause_unwrap_and_validation():
    assert p("hello", op="AND") == TermQuery("hello")
    with pytest.raises(ValueError):
        p("a", op="XOR")


def test_unparseable_tail_raises():
    """StandardQueryParser throws QueryNodeParseException on syntax it cannot
    consume; silently dropping the tail would evaluate a different query."""
    import pytest
    from lucene_solr_spark.plans.flexible_parser import _tokenize

    with pytest.raises(ValueError, match="cannot tokenize"):
        _tokenize("title /unterminated AND critical")
    # trailing whitespace is not a syntax error
    assert [k for k, _ in _tokenize("a b  ")] == ["term", "term"]
