"""XML CoreParser grammar tests, mirroring the reference's
``queryparser/src/test/.../xml/TestCoreParser.java`` and its ``*.xml``
test-query files (reshaped to this engine's Query AST)."""

import pytest

from lucene_solr_spark.functions.analysis import simple_analyzer
from lucene_solr_spark.plans.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldRangeQuery,
    FieldTermQuery,
    MatchAllQuery,
    PhraseQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_solr_spark.plans.xml_parser import ParserException, parse_xml_query


AN = simple_analyzer()


def parse(xml):
    return parse_xml_query(xml, AN)


def test_term_query_simple():
    # TermQuery.xml — text is normalized against the index convention
    q = parse('<TermQuery fieldName="text">Merger</TermQuery>')
    assert q == TermQuery("merger")


def test_term_query_boost_wraps():
    q = parse('<TermQuery fieldName="text" boost="2.5">bank</TermQuery>')
    assert q == TermQuery("bank", boost=2.5)


def test_term_query_empty_fails():
    # TermQueryEmpty.xml expects a ParserException
    with pytest.raises(ParserException):
        parse('<TermQuery fieldName="text"> </TermQuery>')


def test_term_query_missing_field_fails():
    with pytest.raises(ParserException):
        parse("<TermQuery>bank</TermQuery>")


def test_keyword_field_term():
    q = parse('<TermQuery fieldName="lang">en</TermQuery>')
    assert q == FieldTermQuery("lang", "en")


def test_boolean_query_occurs_variants():
    # BooleanQuery.xml: should / mustnot (case-insensitive) / must, with
    # fieldName inherited from the enclosing element
    q = parse(
        """
        <BooleanQuery fieldName="text">
          <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
          <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
          <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
        </BooleanQuery>"""
    )
    assert q == BooleanQuery(
        (
            BooleanClause(TermQuery("merger"), "SHOULD"),
            BooleanClause(TermQuery("sumitomo"), "MUST_NOT"),
            BooleanClause(TermQuery("bank"), "MUST"),
        )
    )


def test_boolean_query_invalid_occurs():
    with pytest.raises(ParserException):
        parse(
            '<BooleanQuery fieldName="text">'
            '<Clause occurs="mayhaps"><TermQuery>a</TermQuery></Clause>'
            "</BooleanQuery>"
        )


def test_nested_boolean_direct_children_only():
    # NestedBooleanQuery.xml: the getElementsByTagName regression — only
    # DIRECT Clause children belong to each BooleanQuery level
    q = parse(
        """
        <BooleanQuery fieldName="text">
          <Clause occurs="should">
            <BooleanQuery fieldName="text">
              <Clause occurs="must"><TermQuery>inner</TermQuery></Clause>
            </BooleanQuery>
          </Clause>
          <Clause occurs="should"><TermQuery>bank</TermQuery></Clause>
        </BooleanQuery>"""
    )
    assert len(q.clauses) == 2
    inner = q.clauses[0].query
    assert isinstance(inner, BooleanQuery) and len(inner.clauses) == 1


def test_terms_query_analyzes():
    # TermsQuery.xml: analyzer splits the text into SHOULD TermQueries
    q = parse('<TermsQuery fieldName="text">Sumitomo Bank</TermsQuery>')
    assert q == BooleanQuery(
        (
            BooleanClause(TermQuery("sumitomo"), "SHOULD"),
            BooleanClause(TermQuery("bank"), "SHOULD"),
        )
    )


def test_match_all_docs_inside_boolean():
    # MatchAllDocsQuery.xml
    q = parse(
        """
        <BooleanQuery>
          <Clause occurs="must"><MatchAllDocsQuery/></Clause>
          <Clause occurs="filter">
            <RangeQuery fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>
          </Clause>
        </BooleanQuery>"""
    )
    assert q.clauses[0].query == MatchAllQuery()
    assert q.clauses[1].occur == "FILTER"
    assert q.clauses[1].query == FieldRangeQuery("date", "19870409", "19870412", True, True)


def test_range_query_on_text_field_is_term_range():
    q = parse('<RangeQuery fieldName="text" lowerTerm="ka" upperTerm="kz" includeUpper="false"/>')
    assert q == TermRangeQuery("ka", "kz", True, False)


def test_point_range_query_types_and_open_bounds():
    # PointRangeQuery.xml + PointRangeQueryWithoutLowerTerm.xml
    q = parse('<PointRangeQuery fieldName="n" type="int" lowerTerm="120" upperTerm="300"/>')
    assert q == FieldRangeQuery("n", 120, 300, True, True)
    q = parse('<PointRangeQuery fieldName="n" type="double" upperTerm="3.5"/>')
    assert q == FieldRangeQuery("n", None, 3.5, True, True)
    with pytest.raises(ParserException):
        parse('<PointRangeQuery fieldName="n" type="decimal" lowerTerm="1"/>')
    with pytest.raises(ParserException):
        parse('<PointRangeQuery fieldName="n" type="int" lowerTerm="x"/>')


def test_disjunction_max_nested():
    # DisjunctionMaxQuery.xml: nested dismax, tieBreaker attribute
    q = parse(
        """
        <DisjunctionMaxQuery>
          <TermQuery fieldName="a">merger</TermQuery>
          <DisjunctionMaxQuery tieBreaker="0.3">
            <TermQuery fieldName="b">verger</TermQuery>
          </DisjunctionMaxQuery>
        </DisjunctionMaxQuery>"""
    )
    assert isinstance(q, DisjunctionMaxQuery) and q.tie_breaker == 0.0
    assert q.disjuncts[0] == FieldTermQuery("a", "merger")
    assert q.disjuncts[1].tie_breaker == pytest.approx(0.3)


def test_constant_score_wraps_child():
    # ConstantScoreQuery.xml
    q = parse(
        '<ConstantScoreQuery>'
        '<RangeQuery fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>'
        "</ConstantScoreQuery>"
    )
    assert isinstance(q, ConstantScoreQuery)
    assert q.query == FieldRangeQuery("date", "19870409", "19870412", True, True)


def test_user_query_delegates_to_classic():
    # UserInputQuery.xml: quoted phrase through the classic parser
    q = parse(
        """
        <BooleanQuery>
          <Clause occurs="must"><UserQuery>"Bank of England"</UserQuery></Clause>
          <Clause occurs="filter">
            <RangeQuery fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>
          </Clause>
        </BooleanQuery>"""
    )
    assert q.clauses[0].query == PhraseQuery(("bank", "of", "england"))


def test_user_query_custom_field():
    # UserInputQueryCustomField.xml: fieldName redirects the default field
    q = parse('<UserQuery fieldName="lang">en</UserQuery>')
    assert q == FieldTermQuery("lang", "en") or isinstance(q, (TermQuery, BooleanQuery))


def test_span_query_composition():
    # SpanQuery.xml shape: SpanNear of SpanOr + SpanOrTerms + nested SpanNear
    q = parse(
        """
        <SpanNear slop="8" inOrder="false" fieldName="text">
          <SpanOr><SpanTerm>killed</SpanTerm><SpanTerm>died</SpanTerm></SpanOr>
          <SpanOrTerms>miner miners</SpanOrTerms>
          <SpanNear slop="6" inOrder="false">
            <SpanTerm>mine</SpanTerm>
            <SpanOrTerms>worker workers</SpanOrTerms>
          </SpanNear>
        </SpanNear>"""
    )
    assert q == SpanNearQuery(
        (
            ("killed", "died"),
            ("miner", "miners"),
            SpanNearQuery(("mine", ("worker", "workers")), slop=6, in_order=False),
        ),
        slop=8,
        in_order=False,
    )


def test_span_near_requires_slop():
    with pytest.raises(ParserException):
        parse('<SpanNear fieldName="text"><SpanTerm>a</SpanTerm></SpanNear>')


def test_span_first_and_not():
    q = parse('<SpanFirst end="10" fieldName="text"><SpanTerm>fire</SpanTerm></SpanFirst>')
    assert q == SpanFirstQuery("fire", end=10)
    q = parse(
        """
        <SpanNot fieldName="text">
          <Include><SpanTerm>fire</SpanTerm></Include>
          <Exclude><SpanTerm>drill</SpanTerm></Exclude>
        </SpanNot>"""
    )
    assert q == SpanNotQuery("fire", "drill")


def test_span_or_top_level():
    q = parse('<SpanOrTerms fieldName="text">fire burn</SpanOrTerms>')
    assert q == SpanOrQuery(("fire", "burn"))


def test_boosting_term_query_rejected_with_pointer():
    # BoostingTermQuery.xml — payload scoring is an operator here, not AST
    with pytest.raises(ParserException, match="payload_score_topk"):
        parse('<BoostingTermQuery fieldName="text">heavy</BoostingTermQuery>')


def test_dtd_and_entities_rejected():
    # DOCTYPE_TermQuery.xml / ENTITY_TermQuery.xml: hardened XML parsing
    with pytest.raises(ParserException):
        parse('<!DOCTYPE q [<!ENTITY e "x">]><TermQuery fieldName="text">&e;</TermQuery>')


def test_unknown_tag_fails():
    with pytest.raises(ParserException, match="No QueryObjectBuilder"):
        parse('<FuzzyLikeThisQuery fieldName="text">bank</FuzzyLikeThisQuery>')


def test_malformed_xml_fails():
    with pytest.raises(ParserException):
        parse("<TermQuery fieldName=")
