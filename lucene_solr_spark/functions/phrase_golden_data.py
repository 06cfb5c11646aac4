"""Reference golden vectors: sloppy-phrase, multi-phrase, and JSON-facet
assertion literals.

Transcribed from the reference's own test suites (round-5 extension of the
golden-oracle ladder in :mod:`span_golden_data`):

- ``reference lucene/core/src/test/org/apache/lucene/search/
  TestSloppyPhraseQuery.java:39-135`` — the fixed document set (DOC_1..DOC_5_4
  built from S_1/S_2) and every ``checkPhraseQuery`` "Wrong number of hits"
  expectation, including the LUCENE-1310 slop-6 threshold
  (testDoc2_Query1) and the LUCENE-3412 repeat-consistency family
  (testDoc5_Query5), plus the asserted ``freq2 > freq1`` orderings from the
  MaxFreqCollector (sloppyWeight sums).
- ``reference lucene/core/src/test/org/apache/lucene/search/
  TestMultiPhraseQuery.java:49-290`` — the corpora and assertEquals hit-count
  literals of testPhrasePrefix (incl. the slop-1 case), testTall
  (LUCENE-2580), testMultiExactWithRepeats (explicit slot positions 0 and 2),
  testBooleanQueryContainingSingleTermPrefixQuery (bug 33161), and testNoDocs.
- ``reference solr/core/src/test/org/apache/solr/search/facet/
  TestJsonFacets.java:233-965`` — the ``indexSimple`` 6-doc corpus and the
  assertJQ facet literals of testMethodStream (root stats, sort/mincount/
  prefix/offset bucket arrays, nested cat→where buckets with min/max stats)
  and testBehaviorEquivilenceOfUninvertibleFalse (the num_i:[* TO 2]
  where_s buckets).

The engine never reads these literals — contract oracles and pytest replays
are built from THIS module only, so agreement pins the Spark engine against
the reference's documented behavior, not a builder re-derivation.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# TestSloppyPhraseQuery.java:39-56 fixed fixtures (whitespace tokens, no
# lowercasing: MockTokenizer.WHITESPACE, false)
_S_1 = "A A A"
_S_2 = "A 1 2 3 A 4 5 6 A"

SLOPPY_DOCS = {
    "doc_1": f"X {_S_1} Y",
    "doc_2": f"X {_S_2} Y",
    "doc_3": f"X {_S_1} A Y",
    "doc_1_b": f"X {_S_1} Y N N N N {_S_1} Z",
    "doc_2_b": f"X {_S_2} Y N N N N {_S_2} Z",
    "doc_3_b": f"X {_S_1} A Y N N N N {_S_1} A Y",
    "doc_4": "A A X A X B A X B B A A X B A A",
    "doc_5_3": "H H H X X X H H H X X X H H H",
    "doc_5_4": "H H H H",
}
# stable doc ids for the combined index (doc_id = list position)
SLOPPY_DOC_IDS = {name: i for i, name in enumerate(SLOPPY_DOCS)}

SLOPPY_QUERIES = {
    "q1": _S_1.split(),           # QUERY_1 "A A A"
    "q2": _S_2.split(),           # QUERY_2
    "q4": "X A A".split(),        # QUERY_4
    "q54": "H H H H".split(),     # QUERY_5_4
}

# (variant, query, doc, expected(slop) over the reference's slop loop) —
# each entry transcribes one checkPhraseQuery call site:
#   testDoc4_Query4  (slop<1 ? 0 : 1, slops 0..29)
#   testDoc1_Query1  (always 1, both docs, slops 0..29)
#   testDoc2_Query1  (slop<6 ? 0 : 1; doc_2_b only asserted when slop>=6)
#   testDoc2_Query2  (always 1, both docs)
#   testDoc3_Query1  (always 1, both docs)
#   testDoc5_Query5  (doc_5_4 always 1, doc_5_3 always 0, slops 0..2)
SLOPPY_CASES = [
    ("q4_doc4", "q4", "doc_4", lambda slop: 0 if slop < 1 else 1, range(30)),
    ("q1_doc1", "q1", "doc_1", lambda slop: 1, range(30)),
    ("q1_doc1b", "q1", "doc_1_b", lambda slop: 1, range(30)),
    ("q1_doc2", "q1", "doc_2", lambda slop: 0 if slop < 6 else 1, range(30)),
    ("q1_doc2b", "q1", "doc_2_b", lambda slop: 1, range(6, 30)),
    ("q2_doc2", "q2", "doc_2", lambda slop: 1, range(30)),
    ("q2_doc2b", "q2", "doc_2_b", lambda slop: 1, range(30)),
    ("q1_doc3", "q1", "doc_3", lambda slop: 1, range(30)),
    ("q1_doc3b", "q1", "doc_3_b", lambda slop: 1, range(30)),
    ("q54_doc54", "q54", "doc_5_4", lambda slop: 1, range(3)),
    ("q54_doc53", "q54", "doc_5_3", lambda slop: 0, range(3)),
]

# the freq2 > freq1 orderings asserted alongside (freq = MaxFreqCollector's
# Σ sloppyWeight): (query, doc_lo, doc_hi, slops-with-both-docs-checked)
SLOPPY_FREQ_GT = [
    ("q1", "doc_1", "doc_1_b", range(30)),
    ("q1", "doc_2", "doc_2_b", range(6, 30)),
    ("q2", "doc_2", "doc_2_b", range(30)),
    ("q1", "doc_3", "doc_3_b", range(30)),
]

# the slop subset the contract row evaluates end-to-end through the engine
# (every boundary the reference's formulas switch on, both sides); pytest
# replays the FULL loops against the matcher
SLOPPY_CONTRACT_SLOPS = (0, 1, 2, 5, 6, 7, 29)


def sloppy_expected_rows():
    """(variant, slop, matched) rows for the contract slop subset — the
    reference's expectedNumResults literal at each asserted (case, slop)."""
    out = []
    for variant, _q, _d, expect, slops in SLOPPY_CASES:
        for slop in slops:
            if slop in SLOPPY_CONTRACT_SLOPS:
                out.append((variant, slop, expect(slop)))
    return out


# --------------------------------------------------------------------------
# TestMultiPhraseQuery.java corpora (add(...) calls, one doc per line) and
# assertEquals hit-count literals
MULTIPHRASE_CORPORA = {
    "pp": [  # testPhrasePrefix:49-140
        "blueberry pie", "blueberry strudel", "blueberry pizza",
        "blueberry chewing gum", "bluebird pizza", "bluebird foobar pizza",
        "piccadilly circus",
    ],
    "tall": ["blueberry chocolate pie", "blueberry chocolate tart"],  # :143-159
    "abc": ["a b c d e f g h i k"],                                   # :182-199
    "bool": ["blueberry pie", "blueberry chewing gum", "blue raspberry pie"],  # :204-238
    "nodocs": ["a note"],                                             # :267-288
}

# variant -> (corpus, expected hit count).  The query constructions live in
# the contract callable (driver_contract.ft_golden_multiphrase); prefix
# slots are expanded against the index's own term dictionary exactly like
# the reference's TermsEnum.seekCeil loop.
MULTIPHRASE_COUNTS = {
    "pp_blueberry_pistar": ("pp", 2),    # "blueberry (piccadilly pie pizza)"
    "pp_strawberry_pistar": ("pp", 0),   # "strawberry (piccadilly pie pizza)"
    "pp_bluestar_pizza": ("pp", 2),      # "(blueberry bluebird) pizza"
    "pp_bluestar_pizza_slop1": ("pp", 3),  # same, setSlop(1)
    "tall_union_last_slot": ("tall", 2),   # blueberry chocolate (pie|tart)
    "exact_repeats_gap": ("abc", 1),       # (a|d)@0 (a|f)@2
    "bool_single_slot_prefix": ("bool", 2),  # +pie +mpq[(blueberry|blue)]
    "nodocs_unindexed_slot": ("nodocs", 0),  # a (nope|nope)
}


# --------------------------------------------------------------------------
# TestFuzzyQuery.testFuzziness (``reference lucene/core/src/test/org/apache/
# lucene/search/TestFuzzyQuery.java:56-183``): the 7-word corpus and every
# assertEquals over hit counts and hit-surface orderings (scoring order under
# the TopTermsBlendedFreqScoringRewrite).  The 'anotherfield' case is omitted
# (single-field engine, declared deviation).  doc_id = list position.
FUZZY_WORDS = ["aaaaa", "aaaab", "aaabb", "aabbb", "abbbb", "bbbbb", "ddddd"]

# (variant, query term, prefix_length, max_expansions, transpositions,
#  asserted size, asserted surface order or None when only size is asserted).
# Constructions mirror the reference call sites: the 3-arg ctor keeps
# defaultTranspositions=true; the maxExpansions=2 case passes false.
FUZZY_CASES = [
    ("aaaaa_p0", "aaaaa", 0, 50, True, 3, ["aaaaa", "aaaab", "aaabb"]),
    ("aaaaa_p1", "aaaaa", 1, 50, True, 3, None),
    ("aaaaa_p2", "aaaaa", 2, 50, True, 3, None),
    ("aaaaa_p3", "aaaaa", 3, 50, True, 3, None),
    ("aaaaa_p4", "aaaaa", 4, 50, True, 2, None),
    ("aaaaa_p5", "aaaaa", 5, 50, True, 1, None),
    ("aaaaa_p6", "aaaaa", 6, 50, True, 1, None),
    ("bbbbb_p0", "bbbbb", 0, 50, True, 3, ["bbbbb", "abbbb", "aabbb"]),
    ("bbbbb_maxexp2", "bbbbb", 0, 2, False, 2, ["bbbbb", "abbbb"]),
    ("xxxxx_p0", "xxxxx", 0, 50, True, 0, None),
    ("aaccc_p0", "aaccc", 0, 50, True, 0, None),
    ("aaaac_p0", "aaaac", 0, 50, True, 3, ["aaaaa", "aaaab", "aaabb"]),
    ("aaaac_p1", "aaaac", 1, 50, True, 3, ["aaaaa", "aaaab", "aaabb"]),
    ("aaaac_p2", "aaaac", 2, 50, True, 3, ["aaaaa", "aaaab", "aaabb"]),
    ("aaaac_p3", "aaaac", 3, 50, True, 3, ["aaaaa", "aaaab", "aaabb"]),
    ("aaaac_p4", "aaaac", 4, 50, True, 2, ["aaaaa", "aaaab"]),
    ("aaaac_p5", "aaaac", 5, 50, True, 0, None),
    ("ddddX_p0", "ddddX", 0, 50, True, 1, ["ddddd"]),
    ("ddddX_p1", "ddddX", 1, 50, True, 1, ["ddddd"]),
    ("ddddX_p2", "ddddX", 2, 50, True, 1, ["ddddd"]),
    ("ddddX_p3", "ddddX", 3, 50, True, 1, ["ddddd"]),
    ("ddddX_p4", "ddddX", 4, 50, True, 1, ["ddddd"]),
    ("ddddX_p5", "ddddX", 5, 50, True, 0, None),
]


def fuzzy_expected_rows():
    """(variant, rank, surface, n) — rank -1/'#size' carries the asserted
    hit count; positive ranks carry the asserted surface order (n = -1)."""
    out = []
    for variant, _t, _p, _m, _tr, size, order in FUZZY_CASES:
        out.append((variant, -1, "#size", size))
        for i, surface in enumerate(order or []):
            out.append((variant, i + 1, surface, -1))
    return out


# --------------------------------------------------------------------------
# TestUnifiedHighlighter (``reference lucene/highlighter/src/test/org/apache/
# lucene/search/uhighlight/TestUnifiedHighlighter.java:128-290``): corpora
# and the EXACT snippet-string assertEquals literals — testBasics,
# testHighlightLastWord, testOneSentence, the three
# testFormatWithMatchExceedingContentLength cases (setMaxLength(17),
# LUCENE-5166: a match crossing the cut is not highlighted), and the title
# half of testMultipleFields.  (variant is doc-indexed within its corpus.)
HIGHLIGHT_CASES = [
    # (variant, corpus texts, query term, max_length, [(doc_id, snippet)])
    ("basics", [
        "This is a test. Just a test highlighting from postings. Feel free to ignore.",
        "Highlighting the first term. Hope it works.",
    ], "highlighting", None, [
        (0, "Just a test <b>highlighting</b> from postings. "),
        (1, "<b>Highlighting</b> the first term. "),
    ]),
    ("last_word", ["This is a test"], "test", None, [
        (0, "This is a <b>test</b>"),
    ]),
    ("one_sentence", ["This is a test.", "Test a one sentence document."], "test", None, [
        (0, "This is a <b>test</b>."),
        (1, "<b>Test</b> a one sentence document."),
    ]),
    ("maxlen_match_at_cut", ["123 TEST 01234 TEST"], "test", 17, [
        (0, "123 <b>TEST</b> 01234 TE"),
    ]),
    ("maxlen_all_beyond_cut", ["123 5678 01234 TEST TEST"], "test", 17, [
        (0, "123 5678 01234 TE"),
    ]),
    ("maxlen_lucene5166", ["123 5678 01234 TEST"], "test", 17, [
        (0, "123 5678 01234 TE"),
    ]),
    ("title_field", [
        "I am hoping for the best.",
        "But best may not be good enough.",
    ], "best", None, [
        (0, "I am hoping for the <b>best</b>."),
        (1, "But <b>best</b> may not be good enough."),
    ]),
]


def highlight_expected_rows():
    return [
        (f"{variant}_{doc_id}", snippet)
        for variant, _texts, _term, _ml, expected in HIGHLIGHT_CASES
        for doc_id, snippet in expected
    ]


# --------------------------------------------------------------------------
# Solr TestGroupingSearch.testGroupingGroupSortingScore_basic (``reference
# solr/core/src/test/org/apache/solr/TestGroupingSearch.java:85-126``): the
# 5-doc corpus (id, id_i, name, title, group_i) and the asserted grouped
# responses — group order, each group's groupValue, numFound, and top doc id
# — for q={!func}id_i grouped by name and q=title:title grouped by group_i.
GROUPING_DOCS = [
    # (id, id_i, name, title, group_i)
    (1, 1, "author1", "a book title", 1),
    (2, 2, "author1", "the title", 2),
    (3, 3, "author2", "a book title", 1),
    (4, 4, "author2", "title", 2),
    (5, 5, "author3", "the title of a title", 1),
]

# (variant, group rank, groupValue, numFound, top doc id) — the assertQ
# XPath literals, flattened
GROUPING_EXPECTED = [
    ("func_by_name", 1, "author3", 1, 5),
    ("func_by_name", 2, "author2", 2, 4),
    ("func_by_name", 3, "author1", 2, 2),
    ("title_by_groupi", 1, "2", 2, 4),
    ("title_by_groupi", 2, "1", 3, 5),
]


# --------------------------------------------------------------------------
# TestJsonFacets.indexSimple (:233-245): (id, cat_s, where_s, num_d, num_i,
# val_b, sparse_s) — None = field absent on that doc
JSON_FACET_DOCS = [
    (1, "A", "NY", 4.0, 2, True, "one"),
    (2, "B", "NJ", -9.0, -5, False, None),
    (3, None, None, None, None, None, None),
    (4, "A", "NJ", 2.0, 3, None, None),
    (5, "B", "NJ", 11.0, 7, None, "two"),
    (6, "B", "NY", -5.0, -5, None, None),
]

# (variant, parent, val, count, stat) — the assertJQ literals, flattened.
# parent '' = top level; stat None where the assert carries no stat.
JSON_FACET_EXPECTED = [
    # testMethodStream: json.facet {x:'sum(num_d)'} / {y:'min(num_d)'} over
    # *:* -> facets=={count:6, x:3.0, y:-9.0}
    ("root_sum", "", "#root", 6, 3.0),
    ("root_min", "", "#root", 6, -9.0),
    # cat: terms cat_s (default sort count desc) -> [B:3, A:2]
    ("cat", "", "B", 3, None), ("cat", "", "A", 2, None),
    # cat2: sort index asc -> [A:2, B:3]
    ("cat2", "", "A", 2, None), ("cat2", "", "B", 3, None),
    # cat3: mincount 3 -> [B:3]
    ("cat3", "", "B", 3, None),
    # cat4: prefix B -> [B:3]
    ("cat4", "", "B", 3, None),
    # cat5: offset 1 (index asc) -> [B:3]
    ("cat5", "", "B", 3, None),
    # nested cat (index asc) -> where: A{NJ:1, NY:1}, B{NJ:2, NY:1} with
    # parent counts A:2 B:3
    ("nested", "", "A", 2, None), ("nested", "", "B", 3, None),
    ("nested", "A", "NJ", 1, None), ("nested", "A", "NY", 1, None),
    ("nested", "B", "NJ", 2, None), ("nested", "B", "NY", 1, None),
    # nested with stats: child x:max(num_d), parent y:min(num_d)
    ("nested_stats", "", "A", 2, 2.0), ("nested_stats", "", "B", 3, -9.0),
    ("nested_stats", "A", "NJ", 1, 2.0), ("nested_stats", "A", "NY", 1, 4.0),
    ("nested_stats", "B", "NJ", 2, 11.0), ("nested_stats", "B", "NY", 1, -5.0),
    # testBehaviorEquivilenceOfUninvertibleFalse: q=num_i:[* TO 2] ->
    # numFound 3, where_s buckets [NY:2, NJ:1]
    ("uninvert_where", "", "#numFound", 3, None),
    ("uninvert_where", "", "NY", 2, None), ("uninvert_where", "", "NJ", 1, None),
]
