"""ASCIIFoldingFilter: known folds, chain ordering, scalar/batch parity,
and end-to-end search over a folded index."""

import pandas as pd

from lucene_solr_spark.functions.analysis import ENGLISH_STOP_WORDS, Analyzer
from lucene_solr_spark.functions.folding_data import FOLD_MAP
from lucene_solr_spark.plans.query import TermQuery


def _an(**kw):
    return Analyzer(ascii_folding=True, **kw)


def test_known_folds():
    an = _an()
    assert an.tokens("café naïve Beyoncé") == ["café".replace("é", "e"), "naive", "beyonce"]
    assert an.tokens("Straße") == ["strasse"]
    assert an.tokens("Æsir œuvre") == ["aesir", "oeuvre"]
    # ascii text is untouched
    assert an.tokens("plain ascii 42") == ["plain", "ascii", "42"]


def test_fold_before_stopwords():
    an = _an(stopwords=ENGLISH_STOP_WORDS)
    # 'thé' folds to 'the' and stops out, leaving a position hole
    assert an.tokens("thé cat") == ["cat"]
    assert an.tokens_with_positions("thé cat") == [("cat", 1)]


def test_batch_matches_scalar_on_mixed_unicode():
    an = _an(stopwords=ENGLISH_STOP_WORDS)
    texts = pd.Series(["café thé crème brûlée", "plain text", "", "Œdipe à Colône"])
    flat, rows, dl, pos = an.analyze_batch_with_positions(texts)
    for r, text in enumerate(texts):
        got = [(t, p) for t, rr, p in zip(flat, rows, pos) if rr == r]
        assert got == an.tokens_with_positions(text), r
    assert dl.tolist() == [len(an.tokens(t)) for t in texts]


def test_table_is_nontrivial():
    assert len(FOLD_MAP) > 1000
    assert FOLD_MAP["ß"] == "ss" and FOLD_MAP["Æ"] == "AE"
    assert all(v.isascii() for v in FOLD_MAP.values())
    assert all(not k.isascii() for k in FOLD_MAP)


def test_folded_index_end_to_end(spark):
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    rows = [
        (0, "Crème brûlée récipe"),
        (1, "creme brulee recipe"),
        (2, "unrelated text entirely"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(corpus, IndexConfig(analyzer=_an(), n_partitions=2))
    s = IndexSearcher(idx, corpus, prune_min_postings=0)
    # accented and plain spellings land on the same term
    got = s.search(TermQuery("brulee"), 10).collect()
    assert sorted(d for d, _ in got) == [0, 1]
    # query-time normalization folds too
    assert _an().tokens("brûlée") == ["brulee"]
