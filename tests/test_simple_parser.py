"""SimpleQueryParser state-machine port: grammar table mirrored from the
reference's TestSimpleQueryParser expectations, plus end-to-end rank identity
through the engine."""

import pytest

from lucene_solr_spark.functions.analysis import standard_analyzer
from lucene_solr_spark.plans.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_solr_spark.plans.simple_parser import SimpleQueryParser


@pytest.fixture(scope="module")
def p():
    return SimpleQueryParser(standard_analyzer())


def occurs(q):
    return [(c.occur, c.query) for c in q.clauses]


def test_single_term(p):
    assert p.parse("Foo") == TermQuery("foo")


def test_whitespace_default_should(p):
    q = p.parse("a b")
    assert occurs(q) == [("SHOULD", TermQuery("a")), ("SHOULD", TermQuery("b"))]


def test_explicit_and(p):
    q = p.parse("a + b")
    assert occurs(q) == [("MUST", TermQuery("a")), ("MUST", TermQuery("b"))]


def test_operation_change_wraps(p):
    q = p.parse("a | b + c")
    inner = BooleanQuery.build(should=[TermQuery("a"), TermQuery("b")])
    assert occurs(q) == [("MUST", inner), ("MUST", TermQuery("c"))]


def test_negation_and_double_negation(p):
    q = p.parse("-foo")
    assert occurs(q) == [("MUST_NOT", TermQuery("foo")), ("SHOULD", MatchAllQuery())]
    assert p.parse("--foo") == TermQuery("foo")


def test_phrase_and_near(p):
    assert p.parse('"a b"') == PhraseQuery(("a", "b"))
    assert p.parse('"a b"~3 ') == PhraseQuery(("a", "b"), slop=3)
    # single-token phrase simplifies to a term
    assert p.parse('"foo"') == TermQuery("foo")


def test_prefix_and_fuzzy(p):
    assert p.parse("Foo*") == PrefixQuery("foo")
    assert p.parse("foo~") == FuzzyQuery("foo", max_edits=2)
    assert p.parse("foo~1") == FuzzyQuery("foo", max_edits=1)
    assert p.parse("foo~5") == FuzzyQuery("foo", max_edits=2)  # capped
    assert p.parse("foo~0") == TermQuery("foo")  # fuzziness 0 -> default


def test_precedence_groups(p):
    q = p.parse("(a | b) + c")
    inner = BooleanQuery.build(should=[TermQuery("a"), TermQuery("b")])
    assert occurs(q) == [("MUST", inner), ("MUST", TermQuery("c"))]


def test_degradation_never_raises(p):
    assert p.parse("") == MatchNoDocsQuery()
    assert p.parse("  *  ") == MatchAllQuery()
    assert p.parse(")") == MatchNoDocsQuery()  # extraneous, ignored
    assert p.parse("(ab") == TermQuery("ab")  # unclosed '(' is extraneous
    assert p.parse('"ab') == TermQuery("ab")  # unclosed '"' is extraneous
    assert p.parse("()") == MatchNoDocsQuery()


def test_escape_joins_token(p):
    # escaped '+' is literal; the analyzer then splits it into two tokens
    q = p.parse(r"a\+b")
    assert occurs(q) == [("SHOULD", TermQuery("a")), ("SHOULD", TermQuery("b"))]
    # escaped '*' prevents prefix
    assert p.parse(r"foo\*") == TermQuery("foo")


def test_must_operator_parser():
    p2 = SimpleQueryParser(standard_analyzer(), default_operator="MUST")
    q = p2.parse("a b")
    assert occurs(q) == [("MUST", TermQuery("a")), ("MUST", TermQuery("b"))]
    with pytest.raises(ValueError):
        SimpleQueryParser(standard_analyzer(), default_operator="FILTER")


def test_end_to_end_rank_identity(searcher):
    p3 = SimpleQueryParser(standard_analyzer())
    parsed = p3.parse("wuloze | ge0")
    direct = BooleanQuery.build(should=[TermQuery("wuloze"), TermQuery("ge0")])
    got = [(r["doc_id"], r["score"]) for r in searcher.search(parsed, 10).df.collect()]
    want = [(r["doc_id"], r["score"]) for r in searcher.search(direct, 10).df.collect()]
    assert got == want


def test_negation_end_to_end(searcher):
    p4 = SimpleQueryParser(standard_analyzer())
    q = p4.parse("ge0 + -wuloze")
    rows = searcher.search(q, 10000).df.collect()
    assert rows
    with_w = {r["doc_id"] for r in searcher.search(TermQuery("wuloze"), 10000).df.collect()}
    assert all(r["doc_id"] not in with_w for r in rows)


# ---- never-raise property (the reference parser "will never throw an
# exception... will most likely not give you the results you expected
# either" — SimpleQueryParser.java class javadoc)
try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYP = True
except Exception:  # pragma: no cover
    _HAS_HYP = False

if _HAS_HYP:

    @given(st.text(alphabet='ab("|+-~*\\) \t01', max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_parser_never_raises(s):
        q = SimpleQueryParser(standard_analyzer()).parse(s)
        assert q is not None

    @given(st.text(max_size=30))
    @settings(max_examples=150, deadline=None)
    def test_parser_never_raises_unicode(s):
        assert SimpleQueryParser(standard_analyzer()).parse(s) is not None


# ---- randomized parse-then-search equivalence: any operator soup the
# parser accepts must evaluate identically on the distributed engine and
# the scalar oracle (the TestBoolean2 / control-collection pattern)
if _HAS_HYP:
    from hypothesis import HealthCheck

    @pytest.fixture(scope="module")
    def parse_vocab(oracle):
        by_df = sorted(oracle.postings.items(), key=lambda kv: (-len(kv[1]), kv[0]))
        terms = [t for t, _ in by_df[:3]] + [t for t, _ in by_df[len(by_df) // 2:][:2]]
        return terms + ["zzz_absent"]

    @settings(
        max_examples=25,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(data=st.data())
    def test_random_parsed_strings_match_oracle(data, searcher, oracle, parse_vocab):
        ops = st.sampled_from(["+", "-", "|", "(", ")", '"'])
        prefixes = st.sampled_from([w[:2] + "*" for w in parse_vocab[:3]])
        piece = st.one_of(st.sampled_from(parse_vocab), ops, prefixes)
        sep = data.draw(st.sampled_from([" ", ""]))
        s = sep.join(data.draw(st.lists(piece, min_size=1, max_size=6)))
        q = SimpleQueryParser(standard_analyzer()).parse(s)
        expect = oracle.search(q, 10)
        got = searcher.search(q, 10, prune=True).collect()
        assert [(d, sc) for d, sc in expect] == got, (s, q)
