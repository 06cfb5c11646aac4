"""WordDelimiterGraphFilter: golden tokens/positions pinned to the reference
test vectors (TestWordDelimiterGraphFilter.java), batch/stream identity, and
end-to-end BM25 over a WDGF index."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions.analysis import Analyzer, wdgf_analyzer
from lucene_solr_spark.functions.worddelimiter import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    WDGF_DEFAULT_FLAGS,
    word_delimiter_parts,
)

D = WDGF_DEFAULT_FLAGS
ALLCAT = D | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL


# -------------------------------------------- golden vectors (reference tests)
@pytest.mark.parametrize(
    "text,expected",
    [
        # TestWordDelimiterGraphFilter.doSplit vectors (:135-166)
        ("basic-split", ["basic", "split"]),
        ("camelCase", ["camel", "Case"]),
        ("test's'", ["test"]),
        ("Роберт", ["Роберт"]),
        ("РобЕрт", ["Роб", "Ерт"]),
        ("aǅungla", ["aǅungla"]),  # composed titlecase: no split
        ("हिन्दी", ["हिन्दी"]),  # combining spacing mark: no split
        ("١٢٣٤", ["١٢٣٤"]),  # non-ascii digits: no split
        # class javadoc vectors
        ("PowerShot", ["Power", "Shot"]),
        ("SD500", ["SD", "500"]),
        ("//hello---there, 'dude'", ["hello", "there", "dude"]),
        ("O'Neil's", ["O", "Neil"]),
    ],
)
def test_dosplit_vectors(text, expected):
    parts, _ = word_delimiter_parts(text, D)
    assert [t for t, _ in parts] == expected


def test_dosplit_possessive_flag():
    # doSplitPossessive (:180-181)
    assert [t for t, _ in word_delimiter_parts("ra's", D)[0]] == ["ra"]
    no_stem = D & ~STEM_ENGLISH_POSSESSIVE
    assert [t for t, _ in word_delimiter_parts("ra's", no_stem)[0]] == ["ra", "s"]


def test_lots_of_concatenating():
    """testLotsOfConcatenating (:385-400): terms AND graph positions (the
    posIncrement sequence 1,0,0,1,1,0,1 = positions 0,0,0,1,2,2,3)."""
    parts, npos = word_delimiter_parts("abc-def-123-456", ALLCAT)
    assert parts == [
        ("abcdef123456", 0), ("abcdef", 0), ("abc", 0), ("def", 1),
        ("123456", 2), ("123", 2), ("456", 3),
    ]
    assert npos == 4


def test_lots_of_concatenating_preserve():
    """testLotsOfConcatenating2 (:404-425): PRESERVE_ORIGINAL rides at
    position 0 right after the catenate-all term (posInc 1,0,0,0,1,1,0,1)."""
    parts, npos = word_delimiter_parts("abc-def-123-456", ALLCAT | PRESERVE_ORIGINAL)
    assert parts == [
        ("abcdef123456", 0), ("abc-def-123-456", 0), ("abcdef", 0), ("abc", 0),
        ("def", 1), ("123456", 2), ("123", 2), ("456", 3),
    ]
    assert npos == 4


def test_catenate_words_javadoc_vectors():
    parts, _ = word_delimiter_parts("PowerShot", D | CATENATE_WORDS)
    assert parts == [("PowerShot", 0), ("Power", 0), ("Shot", 1)]
    parts, _ = word_delimiter_parts("A's+B's&C's", D | CATENATE_WORDS)
    assert parts == [("ABC", 0), ("A", 0), ("B", 1), ("C", 2)]
    # NOTE: the class javadoc lists the legacy WDF order (catenation after
    # its last part); the graph filter's PositionSorter emits longest span
    # first at each position, as testLotsOfConcatenating pins
    parts, npos = word_delimiter_parts("Super-Duper-XL500-42-AutoCoder!", D | CATENATE_WORDS)
    assert parts == [
        ("SuperDuperXL", 0), ("Super", 0), ("Duper", 1), ("XL", 2),
        ("500", 3), ("42", 4), ("AutoCoder", 5), ("Auto", 5), ("Coder", 6),
    ]
    assert npos == 7


def test_catenate_all_only():
    parts, npos = word_delimiter_parts("wi-fi-4000", CATENATE_ALL)
    assert parts == [("wifi4000", 0)] and npos == 1


def test_protected_and_swallowed():
    assert word_delimiter_parts("Wi-Fi", D, frozenset(["Wi-Fi"])) == ([("Wi-Fi", 0)], 1)
    # all-delimiter token: swallowed, leaves a one-position hole
    assert word_delimiter_parts("---", D) == ([], 1)
    assert word_delimiter_parts("---", D | PRESERVE_ORIGINAL) == ([("---", 0)], 1)


def test_flag_validation():
    with pytest.raises(ValueError):
        Analyzer(pattern=r"\S+", word_delimiter=1 << 12)
    with pytest.raises(ValueError):
        Analyzer(pattern=r"\S+", word_delimiter=D, stopwords=frozenset(["a"]))


# ------------------------------------------------- analyzer stream semantics
def test_stream_positions_and_holes():
    a = wdgf_analyzer(ALLCAT)
    got = a.tokens_with_positions("PowerShot --- x3d-J2SE")
    # recompute from the kernel: PowerShot at positions 0-1, the swallowed
    # '---' leaves a hole at 2, x3d-J2SE starts at base 3
    base, want = 0, []
    for raw in "PowerShot --- x3d-J2SE".split():
        parts, npos = word_delimiter_parts(raw, ALLCAT)
        want += [(t.lower(), base + sp) for t, sp in parts]
        base += npos
    assert got == want
    # holes advance positions: the token after '---' starts at base 3
    assert min(p for t, p in got if t.startswith("x")) == 3


def test_batch_matches_stream():
    """analyze_batch_with_positions == per-row tokens_with_positions, and dl
    counts occupied positions only (overlap catenations discounted)."""
    texts = [
        "PowerShot SD500 wi-fi",
        "Super-Duper-XL500-42-AutoCoder! O'Neil's",
        "",
        "--- ,,, ...",
        "snake_case_name camelCaseName j2se XL-500",
        "basic-split test's' Wi-Fi",
    ]
    for flags in (D, ALLCAT, ALLCAT | PRESERVE_ORIGINAL, CATENATE_ALL | GENERATE_WORD_PARTS):
        a = wdgf_analyzer(flags)
        flat, rows, dl, pos = a.analyze_batch_with_positions(pd.Series(texts))
        per_row = {i: [] for i in range(len(texts))}
        for t, r, p in zip(flat, rows, pos):
            per_row[int(r)].append((t, int(p)))
        for i, text in enumerate(texts):
            assert per_row[i] == a.tokens_with_positions(text), (flags, i)
            # dl = number of distinct occupied positions
            assert dl[i] == len({p for _, p in per_row[i]}), (flags, i)


def test_wdgf_index_search(spark):
    """End-to-end: WDGF(catenate) index finds both the split parts and the
    catenated form, ranked by exact BM25."""
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import PhraseQuery, TermQuery

    rows = [
        (0, "the PowerShot camera is a PowerShot"),
        (1, "power shot cameras shoot power"),
        (2, "wi-fi WiFi wifi setups"),
        (3, "unrelated text entirely"),
    ]
    corpus = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    idx = build_index(
        corpus, IndexConfig(analyzer=wdgf_analyzer(ALLCAT), n_partitions=4)
    )
    s = IndexSearcher(idx, corpus)
    # catenated term matches doc 0 (from PowerShot) — and docs with literal wifi
    hits = {d for d, _ in s.search(TermQuery("powershot"), 10).collect()}
    assert hits == {0}
    wifi_hits = {d for d, _ in s.search(TermQuery("wifi"), 10).collect()}
    assert wifi_hits == {2}  # wi-fi catenation + WiFi case-split catenation + literal
    # split parts are phrase-queryable across the graph positions
    ph = {d for d, _ in s.search(PhraseQuery(("power", "shot")), 10).collect()}
    assert ph == {0, 1}
