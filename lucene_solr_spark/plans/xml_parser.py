"""XML query parser — the CoreParser surface over the existing Query AST.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:41`` and its builder registry (``xml/builders/*.java``).
Each XML element tag maps to one builder; builders read attributes with
field-name *inheritance* (``DOMUtils.getAttributeWithInheritance``: a missing
``fieldName`` walks up the ancestor chain, so ``<BooleanQuery
fieldName="contents">`` scopes its whole subtree) and produce the same Query
dataclasses the classic/flexible parsers emit, so evaluation is shared.

Supported tags (the full CoreParser registry):

========================  ====================================================
``TermQuery``             TermQuery on the analyzed text field, or
                          FieldTermQuery for keyword columns
                          (``builders/TermQueryBuilder.java``)
``TermsQuery``            analyze text → SHOULD-of-terms BooleanQuery with
                          ``minimumNumberShouldMatch``
                          (``builders/TermsQueryBuilder.java``)
``MatchAllDocsQuery``     MatchAllQuery
``BooleanQuery``          ``<Clause occurs=should|must|mustNot|filter>``
                          children; ``minimumNumberShouldMatch``; only DIRECT
                          children count (``builders/BooleanQueryBuilder.java``
                          — the NestedBooleanQuery.xml regression)
``RangeQuery``            lexicographic TermRangeQuery on the text field,
                          FieldRangeQuery (string bounds) on other columns
``PointRangeQuery``       numeric FieldRangeQuery; ``type`` attr one of
                          int|long|float|double, missing bound = open
                          (``builders/PointRangeQueryBuilder.java``)
``DisjunctionMaxQuery``   all element children are disjuncts; ``tieBreaker``
``ConstantScoreQuery``    wraps its first element child
``UserQuery``             classic-syntax parse of the text content
                          (``builders/UserInputQueryBuilder.java``)
``SpanTerm``              single-term span
``SpanOr`` /              union of SpanTerm children / analyzed text
``SpanOrTerms``           (``builders/SpanOrBuilder.java``, ``SpanOrTerms…``)
``SpanNear``              ``slop`` (required), ``inOrder`` (default false);
                          clauses may be SpanTerm, SpanOr(Terms), or nested
                          SpanNear (``builders/SpanNearBuilder.java``)
``SpanFirst``             ``end`` (default 1) over a single-term span
``SpanNot``               ``<Include>``/``<Exclude>`` single-term spans
========================  ====================================================

``boost`` on any element wraps the result (``BoostQuery``) or sets the span
query's own boost, mirroring ``SpanBoostQuery``.

Documented deviations:

- Term/terms text on the analyzed default field is normalized with the
  supplied analyzer (our index stores normalized terms; the reference's
  TermQueryBuilder trusts the caller to pre-normalize).
- ``BoostingTermQuery`` (payload-scored term) is rejected with a pointer to
  :func:`..operators.payloads.payload_score_topk` — payload scoring is a
  collector-level operator here, not an AST node.
- Span clauses nested in positions our span AST cannot express (a SpanNot
  inside a SpanNear, arbitrary spans under SpanFirst/SpanNot) raise
  ParserException instead of silently approximating.
- DTD/entity declarations are rejected, mirroring CoreParser's hardened
  DocumentBuilderFactory (``CoreParser.java`` disallow-doctype-decl).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd

from .parser import parse_query
from .query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldRangeQuery,
    FieldTermQuery,
    MatchAllQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    TermRangeQuery,
)


class ParserException(ValueError):
    """Mirror of ``queryparser/xml/ParserException.java``."""


class _Ctx:
    """Parse context: parent links for attribute inheritance + analyzer."""

    def __init__(self, root: ET.Element, analyzer, default_field: str):
        self.parents = {child: parent for parent in root.iter() for child in parent}
        self.analyzer = analyzer
        self.default_field = default_field

    # DOMUtils.getAttributeWithInheritance
    def inherited(self, e: ET.Element, name: str):
        while e is not None:
            v = e.get(name)
            if v is not None and v != "":
                return v
            e = self.parents.get(e)
        return None

    def field_or_fail(self, e: ET.Element) -> str:
        v = self.inherited(e, "fieldName")
        if v is None:
            raise ParserException(f"{e.tag} missing \"fieldName\" attribute")
        return v

    def analyze(self, text: str) -> list:
        return list(self.analyzer.analyze_batch(pd.Series([text]))[0])


def _text_or_fail(e: ET.Element) -> str:
    v = (e.text or "").strip()
    if not v:
        raise ParserException(f"{e.tag} has no text")
    return v


def _boost(e: ET.Element) -> float:
    return float(e.get("boost", 1.0))


def _wrap_boost(q: Query, e: ET.Element) -> Query:
    b = _boost(e)
    return BoostQuery(q, b) if b != 1.0 else q


def _bool_attr(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    return default if v is None else v.strip().lower() == "true"


# --------------------------------------------------------------- builders


def _term_query(e, ctx):
    field = ctx.field_or_fail(e)
    value = _text_or_fail(e)
    if field == ctx.default_field:
        q = TermQuery(ctx.analyzer.normalize(value), boost=_boost(e))
        return q
    return FieldTermQuery(field, value, boost=_boost(e))


def _terms_query(e, ctx):
    field = ctx.field_or_fail(e)
    if field != ctx.default_field:
        raise ParserException("TermsQuery analyzes text: only the analyzed default field is indexed with postings")
    msm = int(e.get("minimumNumberShouldMatch", 0))
    clauses = tuple(
        BooleanClause(TermQuery(t), "SHOULD") for t in ctx.analyze(_text_or_fail(e))
    )
    return _wrap_boost(BooleanQuery(clauses, minimum_should_match=msm), e)


def _match_all(e, ctx):
    return MatchAllQuery()


_OCCURS = {"should": "SHOULD", "must": "MUST", "mustnot": "MUST_NOT"}


def _boolean_query(e, ctx):
    clauses = []
    for node in e:  # DIRECT children only — the NestedBooleanQuery regression
        if node.tag != "Clause":
            continue
        occs = node.get("occurs")
        # BooleanQueryBuilder.getOccursValue: should/must/mustNot are
        # case-insensitive, "filter" is exact, missing defaults to should
        if occs is None or occs == "":
            occur = "SHOULD"
        elif occs.lower() in _OCCURS:
            occur = _OCCURS[occs.lower()]
        elif occs == "filter":
            occur = "FILTER"
        else:
            raise ParserException(f'Invalid value for "occurs" attribute of clause:{occs}')
        kids = list(node)
        if not kids:
            raise ParserException("Clause does not contain a child element")
        clauses.append(BooleanClause(_build(kids[0], ctx), occur))
    q = BooleanQuery(
        tuple(clauses), minimum_should_match=int(e.get("minimumNumberShouldMatch", 0))
    )
    return _wrap_boost(q, e)


def _range_query(e, ctx):
    field = ctx.field_or_fail(e)
    lower = e.get("lowerTerm") or None
    upper = e.get("upperTerm") or None
    incl_l = _bool_attr(e, "includeLower", True)
    incl_u = _bool_attr(e, "includeUpper", True)
    if field == ctx.default_field:
        return TermRangeQuery(lower, upper, incl_l, incl_u, boost=_boost(e))
    return FieldRangeQuery(field, lower, upper, incl_l, incl_u, boost=_boost(e))


_POINT_TYPES = {"int": int, "long": int, "float": float, "double": float}


def _point_range_query(e, ctx):
    field = ctx.field_or_fail(e)
    typ = (e.get("type") or "int").lower()
    if typ not in _POINT_TYPES:
        raise ParserException("type attribute must be one of: [long, int, double, float]")
    conv = _POINT_TYPES[typ]
    try:
        lower = conv(e.get("lowerTerm")) if e.get("lowerTerm") else None
        upper = conv(e.get("upperTerm")) if e.get("upperTerm") else None
    except ValueError as exc:
        raise ParserException("Could not parse lowerTerm or upperTerm into a number") from exc
    return FieldRangeQuery(field, lower, upper, True, True, boost=_boost(e))


def _dismax_query(e, ctx):
    disjuncts = tuple(_build(kid, ctx) for kid in e)
    q = DisjunctionMaxQuery(disjuncts, tie_breaker=float(e.get("tieBreaker", 0.0)))
    return _wrap_boost(q, e)


def _constant_score(e, ctx):
    kids = list(e)
    if not kids:
        raise ParserException(f"{e.tag} does not contain a child element")
    return ConstantScoreQuery(_build(kids[0], ctx), boost=_boost(e))


def _user_query(e, ctx):
    field = ctx.inherited(e, "fieldName") or ctx.default_field
    q = parse_query(_text_or_fail(e), ctx.analyzer, default_field=field)
    return _wrap_boost(q, e)


# ---- spans: the clause forms our SpanNearQuery AST accepts are a single
# term (str), an alternatives tuple (inline SpanOr), or a nested
# SpanNearQuery — exactly CoreParser's common compositions (SpanQuery.xml)


def _span_clause(e, ctx):
    """Resolve a span child element to a SpanNearQuery clause."""
    if e.tag == "SpanTerm":
        return ctx.analyzer.normalize(_text_or_fail(e))
    if e.tag == "SpanOrTerms":
        return tuple(ctx.analyze(_text_or_fail(e)))
    if e.tag == "SpanOr":
        terms = []
        for kid in e:
            c = _span_clause(kid, ctx)
            if not isinstance(c, str):
                raise ParserException(
                    "SpanOr over non-term spans is outside this engine's span AST"
                )
            terms.append(c)
        return tuple(terms)
    if e.tag == "SpanNear":
        return _span_near(e, ctx)
    raise ParserException(f"unsupported span element: {e.tag}")


def _single_term_span(e, ctx) -> str:
    c = _span_clause(e, ctx)
    if not isinstance(c, str):
        raise ParserException(f"{e.tag}: only single-term spans are supported here")
    return c


def _span_near(e, ctx):
    slop = e.get("slop")
    if slop is None:
        raise ParserException('SpanNear missing "slop" attribute')
    clauses = tuple(_span_clause(kid, ctx) for kid in e)
    return SpanNearQuery(
        clauses, slop=int(slop), in_order=_bool_attr(e, "inOrder", False), boost=_boost(e)
    )


def _span_or_top(e, ctx):
    c = _span_clause(e, ctx)
    return SpanOrQuery(c if isinstance(c, tuple) else (c,), boost=_boost(e))


def _span_first(e, ctx):
    kids = list(e)
    if not kids:
        raise ParserException("SpanFirst does not contain a child element")
    return SpanFirstQuery(
        _single_term_span(kids[0], ctx), end=int(e.get("end", 1)), boost=_boost(e)
    )


def _span_not(e, ctx):
    def child_of(tag):
        kid = next((n for n in e if n.tag == tag), None)
        if kid is None:
            raise ParserException(f'SpanNot missing "{tag}" child element')
        inner = list(kid)
        if not inner:
            raise ParserException(f"{tag} does not contain a child element")
        return inner[0]

    return SpanNotQuery(
        _single_term_span(child_of("Include"), ctx),
        _single_term_span(child_of("Exclude"), ctx),
        boost=_boost(e),
    )


def _boosting_term(e, ctx):
    raise ParserException(
        "BoostingTermQuery (payload scoring) is a collector-level operator in "
        "this engine: use lucene_solr_spark.operators.payloads.payload_score_topk"
    )


_BUILDERS = {
    "TermQuery": _term_query,
    "TermsQuery": _terms_query,
    "MatchAllDocsQuery": _match_all,
    "BooleanQuery": _boolean_query,
    "RangeQuery": _range_query,
    "PointRangeQuery": _point_range_query,
    "DisjunctionMaxQuery": _dismax_query,
    "ConstantScoreQuery": _constant_score,
    "UserQuery": _user_query,
    "SpanTerm": lambda e, ctx: SpanOrQuery((_single_term_span(e, ctx),), boost=_boost(e)),
    "SpanOr": _span_or_top,
    "SpanOrTerms": _span_or_top,
    "SpanNear": _span_near,
    "SpanFirst": _span_first,
    "SpanNot": _span_not,
    "BoostingTermQuery": _boosting_term,
}


def _build(e: ET.Element, ctx: _Ctx) -> Query:
    builder = _BUILDERS.get(e.tag)
    if builder is None:
        raise ParserException(f"No QueryObjectBuilder defined for node {e.tag}")
    return builder(e, ctx)


def parse_xml_query(xml: str, analyzer, default_field: str = "text") -> Query:
    """Parse a CoreParser XML query document into a Query AST."""
    if "<!DOCTYPE" in xml or "<!ENTITY" in xml:
        # CoreParser hardens its DocumentBuilderFactory against DTDs
        # (DOCTYPE_TermQuery.xml / ENTITY_TermQuery.xml must be rejected)
        raise ParserException("DTD/entity declarations are not allowed")
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ParserException(f"Error parsing XML stream: {exc}") from exc
    return _build(root, _Ctx(root, analyzer, default_field))
