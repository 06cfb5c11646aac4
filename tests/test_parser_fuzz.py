"""Fuzz the user-facing query parsers: on ARBITRARY input each must either
return a Query or raise ValueError (the ParseException analog) — never an
internal error (IndexError/KeyError/TypeError/RecursionError/...).

The reference contract: QueryParserBase.parse throws ParseException on
malformed syntax (reference lucene/queryparser/src/java/org/apache/lucene/
queryparser/classic/QueryParserBase.java:105-109); SimpleQueryParser never
throws (covered by tests/test_simple_parser.py).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_solr_spark.functions.analysis import standard_analyzer

_AN = standard_analyzer()

# grammar-heavy alphabet to hit operators/groups/quotes/ranges/escapes hard
_SYNTAX = 'ab1 ()[]{}"~^*?\\+-!|&:/. \t'
_settings = settings(
    max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _ok(parse):
    from lucene_solr_spark.plans.query import Query

    def check(s):
        try:
            q = parse(s)
        except ValueError:
            return  # the declared failure mode (ParseException analog)
        assert q is None or isinstance(q, Query), (s, type(q))

    return check


@_settings
@given(st.text(alphabet=_SYNTAX, max_size=60))
def test_classic_parser_total(s):
    from lucene_solr_spark.plans.parser import parse_query

    _ok(lambda x: parse_query(x, _AN))(s)


@_settings
@given(st.text(max_size=40))
def test_classic_parser_total_unicode(s):
    from lucene_solr_spark.plans.parser import parse_query

    _ok(lambda x: parse_query(x, _AN))(s)


@_settings
@given(st.text(alphabet=_SYNTAX, max_size=60))
def test_flexible_parser_total(s):
    from lucene_solr_spark.plans.flexible_parser import parse_flexible_query

    _ok(lambda x: parse_flexible_query(x, _AN))(s)


@_settings
@given(st.text(alphabet=_SYNTAX + "nNwW", max_size=60))
def test_surround_parser_total(s):
    from lucene_solr_spark.plans.surround_parser import parse_surround

    _ok(parse_surround)(s)


@_settings
@given(st.text(alphabet='<>/ab "=TermQueryfieldName', max_size=80))
def test_xml_parser_total(s):
    from lucene_solr_spark.plans.xml_parser import parse_xml_query

    _ok(lambda x: parse_xml_query(x, _AN))(s)
