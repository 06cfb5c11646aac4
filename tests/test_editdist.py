"""Edit distances (functions/editdist.py) and fuzzy transposition support."""
import numpy as np
import pytest

from lucene_solr_spark.functions.editdist import levenshtein, osa


def test_levenshtein_basic():
    assert levenshtein("scan", "scan") == 0
    assert levenshtein("scan", "scann") == 1
    assert levenshtein("scan", "span") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3


def test_osa_transposition_one_edit():
    # transposition = 1 under OSA, 2 under classic
    assert levenshtein("scan", "sacn") == 2
    assert osa("scan", "sacn") == 1
    assert osa("ab", "ba") == 1
    assert osa("abc", "acb") == 1


def test_osa_matches_levenshtein_without_transpositions():
    rng = np.random.default_rng(7)
    alpha = "abcd"
    for _ in range(200):
        a = "".join(rng.choice(list(alpha), size=rng.integers(0, 7)))
        b = "".join(rng.choice(list(alpha), size=rng.integers(0, 7)))
        assert osa(a, b) <= levenshtein(a, b)
        # OSA >= lev/2 (pre-filter soundness)
        assert osa(a, b) >= levenshtein(a, b) / 2


def test_fuzzy_transpositions_engine(searcher):
    """A transposed form matches with transpositions=True at 1 edit but
    needs 2 classic edits."""
    from lucene_solr_spark.plans.query import ConstantScoreQuery, FuzzyQuery

    # find a real term of length >= 4 in the index
    row = (
        searcher.index.terms.filter("length(term) >= 4 AND df >= 2")
        .orderBy("term")
        .limit(1)
        .collect()
    )
    t = row[0]["term"]
    swapped = t[1] + t[0] + t[2:]
    if swapped == t:
        pytest.skip("degenerate fixture term")
    classic = searcher.search(ConstantScoreQuery(FuzzyQuery(swapped, 1)), 100).collect()
    with_tr = searcher.search(
        ConstantScoreQuery(FuzzyQuery(swapped, 1, transpositions=True)), 100
    ).collect()
    ids_classic = {d for d, _ in classic}
    ids_tr = {d for d, _ in with_tr}
    # docs holding t are reachable only via the transposition edit
    hits_t = {d for d, _ in searcher.search(ConstantScoreQuery(FuzzyQuery(t, 0)), 100).collect()}
    assert hits_t <= ids_tr
    assert ids_classic <= ids_tr


def test_fuzzy_scored_transpositions_runs(searcher):
    from lucene_solr_spark.plans.query import FuzzyQuery

    row = searcher.index.terms.filter("length(term) >= 4").orderBy(
        "term"
    ).limit(1).collect()
    t = row[0]["term"]
    swapped = t[1] + t[0] + t[2:]
    res = searcher.search(FuzzyQuery(swapped, 1, transpositions=True), 10).collect()
    assert isinstance(res, list)  # runs end-to-end; may be empty only if no term within OSA 1
