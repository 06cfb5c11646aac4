"""Round-5 golden-vector replays: TestSloppyPhraseQuery, TestMultiPhraseQuery,
TestJsonFacets literals (see functions/phrase_golden_data.py provenance).

The contract rows (ft_golden_sloppy_phrase / ft_golden_multiphrase /
ft_golden_json_facets) pin the engine end-to-end at the slop boundaries; this
module replays the reference's FULL slop loops (all 30 values) through the
matcher, checks the MaxFreqCollector freq orderings the reference also
asserts, and pins facet bucket ORDER (the contract compare is
order-insensitive)."""

import numpy as np
import pytest

from lucene_solr_spark.functions.phrase_golden_data import (
    JSON_FACET_EXPECTED,
    MULTIPHRASE_COUNTS,
    SLOPPY_CASES,
    SLOPPY_DOCS,
    SLOPPY_FREQ_GT,
    SLOPPY_QUERIES,
)
from lucene_solr_spark.functions.sloppyphrase import sloppy_phrase_freq


def _phrase_freq(doc_name: str, qname: str, slop: int) -> float:
    """The reference checkPhraseQuery freq: whitespace positions, exact
    matcher at slop 0 (PhraseWeight picks ExactPhraseMatcher), sloppy
    matcher otherwise (MaxFreqCollector sums sloppyWeight)."""
    toks = SLOPPY_DOCS[doc_name].split()
    phrase = SLOPPY_QUERIES[qname]
    if slop == 0:
        n = 0
        for j in range(len(toks) - len(phrase) + 1):
            if all(toks[j + m] == phrase[m] for m in range(len(phrase))):
                n += 1
        return float(n)
    pos_lists = [[p for p, t in enumerate(toks) if t == ph] for ph in phrase]
    return float(sloppy_phrase_freq(list(phrase), pos_lists, slop))


def test_sloppy_full_loops_match_reference_literals():
    """Every checkPhraseQuery 'Wrong number of hits' literal, all 30 slops
    (TestSloppyPhraseQuery.java:62-135) — incl. LUCENE-1310 (q1/doc2 flips
    exactly at slop 6) and LUCENE-3412 (H-repeat consistency)."""
    for variant, qname, dname, expect, slops in SLOPPY_CASES:
        for slop in slops:
            got = 1 if _phrase_freq(dname, qname, slop) > 0 else 0
            assert got == expect(slop), (variant, slop)


def test_sloppy_freq_orderings_match_reference():
    """freq2 > freq1 for every doc pair the reference asserts through its
    MaxFreqCollector (the B docs repeat the pattern, so the summed
    sloppyWeight must strictly grow)."""
    for qname, lo, hi, slops in SLOPPY_FREQ_GT:
        for slop in slops:
            f_lo, f_hi = _phrase_freq(lo, qname, slop), _phrase_freq(hi, qname, slop)
            assert f_hi > f_lo, (qname, lo, hi, slop, f_lo, f_hi)


def test_sloppy_contract_row_matches_literals(spark):
    """Engine end-to-end at the boundary slops == the transcribed literals
    (same check the driver runs, locally pinned)."""
    from lucene_solr_spark.driver_contract import ft_queries
    from lucene_solr_spark.functions.phrase_golden_data import sloppy_expected_rows

    df = ft_queries()["ft_golden_sloppy_phrase"](spark, "")
    got = [(r["variant"], r["slop"], r["matched"]) for r in df.collect()]
    assert sorted(got) == sorted(sloppy_expected_rows())


def test_multiphrase_contract_row_matches_literals(spark):
    from lucene_solr_spark.driver_contract import ft_queries

    df = ft_queries()["ft_golden_multiphrase"](spark, "")
    got = {r["variant"]: r["n_hits"] for r in df.collect()}
    want = {v: n for v, (_tag, n) in MULTIPHRASE_COUNTS.items()}
    assert got == want


def test_multiphrase_rejects_reference_invalid_constructions():
    """testNegativeSlop (IllegalArgumentException on setSlop(-2)) and the
    positions/slots alignment contract."""
    from lucene_solr_spark.plans.query import MultiPhraseQuery

    with pytest.raises(ValueError):
        MultiPhraseQuery((("two",), ("one",)), slop=-2)
    with pytest.raises(ValueError):
        MultiPhraseQuery((("a",), ("b",)), positions=(0,))


def test_json_facets_contract_row_matches_literals(spark):
    from lucene_solr_spark.driver_contract import ft_queries

    df = ft_queries()["ft_golden_json_facets"](spark, "")
    got = [
        (r["variant"], r["parent"], r["val"], r["count"], r["stat"]) for r in df.collect()
    ]
    assert sorted(got, key=str) == sorted(JSON_FACET_EXPECTED, key=str)


def test_json_facet_bucket_order_is_pinned(spark):
    """assertJQ literals are ORDERED arrays; the operator's sort must
    reproduce them positionally (count desc -> [B,A]; index asc -> [A,B];
    offset 1 skips A)."""
    from lucene_solr_spark.functions.phrase_golden_data import JSON_FACET_DOCS
    from lucene_solr_spark.operators.jsonfacet import json_facet

    df = spark.createDataFrame(
        JSON_FACET_DOCS,
        schema=(
            "id int, cat_s string, where_s string, num_d double, "
            "num_i int, val_b boolean, sparse_s string"
        ),
    )
    desc = json_facet(df, {"field": "cat_s"}).collect()
    assert [(r["cat_s"], r["cat_s_count"]) for r in desc] == [("B", 3), ("A", 2)]
    asc = json_facet(df, {"field": "cat_s", "sort": "index asc"}).collect()
    assert [(r["cat_s"], r["cat_s_count"]) for r in asc] == [("A", 2), ("B", 3)]
    off = json_facet(df, {"field": "cat_s", "sort": "index asc", "offset": 1}).collect()
    assert [(r["cat_s"], r["cat_s_count"]) for r in off] == [("B", 3)]
    pre = json_facet(df, {"field": "cat_s", "prefix": "B"}).collect()
    assert [(r["cat_s"], r["cat_s_count"]) for r in pre] == [("B", 3)]
    minc = json_facet(df, {"field": "cat_s", "mincount": 3}).collect()
    assert [(r["cat_s"], r["cat_s_count"]) for r in minc] == [("B", 3)]
    root = json_facet(df, {"field": None, "stats": {"x": "sum(num_d)"}}).collect()
    assert len(root) == 1 and root[0]["count"] == 6
    assert root[0]["x"] == pytest.approx(3.0)


def test_multiphrase_sloppy_union_slot_repeats_group_by_intersection():
    """The union-find repeat grouping: set slots sharing a term behave as a
    repeat group (two slots of the same alternatives cannot collide on one
    position), while plain-string phrases keep their exact prior
    semantics."""
    # two identical union slots over positions [0, 5]: collision-free init
    # must land them on distinct positions -> matchLength 4 needs slop >= 4
    sets = [frozenset({"a", "b"}), frozenset({"a", "b"})]
    pos = [[0, 5], [0, 5]]
    assert float(sloppy_phrase_freq(sets, pos, 3)) == 0.0
    assert float(sloppy_phrase_freq(sets, pos, 4)) > 0.0
    # plain strings unchanged: "A A" on positions [0, 1]
    assert float(sloppy_phrase_freq(["A", "A"], [[0, 1], [0, 1]], 0)) > 0.0


def test_fuzzy_query_contract_row_matches_literals(spark):
    """TestFuzzyQuery.testFuzziness literals: every asserted hit count and
    score-ordered surface list through the engine's blended fuzzy rewrite
    (same check the driver runs, locally pinned)."""
    from lucene_solr_spark.driver_contract import ft_queries
    from lucene_solr_spark.functions.phrase_golden_data import fuzzy_expected_rows

    df = ft_queries()["ft_golden_fuzzy_query"](spark, "")
    got = [(r["variant"], r["rank"], r["surface"], r["n"]) for r in df.collect()]
    assert sorted(got) == sorted(fuzzy_expected_rows())


def test_unified_highlight_contract_row_matches_literals(spark):
    """TestUnifiedHighlighter snippet-string literals through the engine's
    passage highlighter (same check the driver runs, locally pinned)."""
    from lucene_solr_spark.driver_contract import ft_queries
    from lucene_solr_spark.functions.phrase_golden_data import highlight_expected_rows

    df = ft_queries()["ft_golden_unified_highlight"](spark, "")
    got = sorted((r["variant"], r["snippet"]) for r in df.collect())
    assert got == sorted(highlight_expected_rows())


def test_grouping_contract_row_matches_literals(spark):
    """TestGroupingSearch grouped-response literals: group order, groupValue,
    numFound, top id for {!func}id_i-by-name and title:title-by-group_i."""
    from lucene_solr_spark.driver_contract import ft_queries
    from lucene_solr_spark.functions.phrase_golden_data import GROUPING_EXPECTED

    df = ft_queries()["ft_golden_grouping"](spark, "")
    got = [
        (r["variant"], r["grank"], r["group_value"], r["n_found"], r["top_id"])
        for r in df.collect()
    ]
    assert sorted(got) == sorted(GROUPING_EXPECTED)
