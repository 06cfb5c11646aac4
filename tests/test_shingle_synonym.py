"""ShingleFilter and replace-mode synonym analysis: scalar/batch parity and
end-to-end rank identity vs the single-process oracle."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions.analysis import (
    Analyzer,
    shingle_analyzer,
    synonym_analyzer,
)
from lucene_solr_spark.plans.query import TermQuery


def test_shingle_tokens_scalar():
    an = shingle_analyzer()
    assert an.tokens("Quick brown fox") == [
        "quick", "brown", "fox", "quick brown", "brown fox",
    ]
    assert an.tokens("one") == ["one"]
    assert an.tokens("") == []
    # positions: shingle at its head token's position, after the unigram
    assert an.tokens_with_positions("a b c") == [
        ("a", 0), ("a b", 0), ("b", 1), ("b c", 1), ("c", 2),
    ]


def test_shingle_batch_matches_scalar_and_discounts_dl():
    an = shingle_analyzer()
    texts = pd.Series(["Quick brown fox", "", "one", "x y x y"])
    flat, rows, dl, pos = an.analyze_batch_with_positions(texts)
    # dl counts unigrams only (shingles are posIncr-0 overlaps)
    assert dl.tolist() == [3, 0, 1, 4]
    for r, text in enumerate(texts):
        got = [(t, p) for t, rr, p in zip(flat, rows, pos) if rr == r]
        assert got == an.tokens_with_positions(text), r


def test_shingle_rejects_hole_producing_chains():
    with pytest.raises(ValueError):
        Analyzer(stopwords=frozenset({"the"}), max_token_length=0, shingles=True)
    with pytest.raises(ValueError):
        Analyzer(max_token_length=255, shingles=True)


def test_synonym_map_scalar_and_batch():
    an = synonym_analyzer({"colour": "color", "grey": "gray"})
    assert an.tokens("Colour grey colors") == ["color", "gray", "colors"]
    flat, rows, dl, pos = an.analyze_batch_with_positions(pd.Series(["Colour grey colors"]))
    assert list(flat) == ["color", "gray", "colors"]
    assert dl.tolist() == [3]
    assert pos.tolist() == [0, 1, 2]


@pytest.fixture(scope="module")
def shingle_setup(spark, fixture_corpus_pdf):
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.testing.oracle import OracleEngine

    an = shingle_analyzer()
    df = spark.createDataFrame(fixture_corpus_pdf)
    corpus = assign_doc_ids(df, ("conv_id", "turn_idx"), n_partitions=8).persist()
    idx = build_index(corpus, IndexConfig(analyzer=an, n_partitions=8)).persist()
    pdf = fixture_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = OracleEngine(zip(range(len(pdf)), pdf["text"]), an)
    return IndexSearcher(idx, corpus, prune_min_postings=0), oracle


def test_shingle_index_rank_identity(shingle_setup):
    searcher, oracle = shingle_setup
    bigrams = sorted(
        ((t, len(p)) for t, p in oracle.postings.items() if " " in t),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert bigrams, "fixture corpus must contain shingles"
    for term, _ in bigrams[:2]:
        expect = oracle.search(TermQuery(term), 10)
        got = searcher.search(TermQuery(term), 10).collect()
        assert [(d, s) for d, s in expect] == got, term
    # stats: avgdl from discounted dl on both sides
    assert searcher.index.doc_count == oracle.doc_count
    assert searcher.index.sum_ttf == oracle.sum_ttf


def test_synonym_index_rank_identity(spark, fixture_corpus_pdf):
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.testing.oracle import OracleEngine

    an = synonym_analyzer({"sort": "key"})
    df = spark.createDataFrame(fixture_corpus_pdf)
    corpus = assign_doc_ids(df, ("conv_id", "turn_idx"), n_partitions=8).persist()
    idx = build_index(corpus, IndexConfig(analyzer=an, n_partitions=8)).persist()
    pdf = fixture_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = OracleEngine(zip(range(len(pdf)), pdf["text"]), an)
    searcher = IndexSearcher(idx, corpus, prune_min_postings=0)

    assert "sort" not in oracle.postings  # fully remapped
    expect = oracle.search(TermQuery("key"), 10)
    got = searcher.search(TermQuery("key"), 10).collect()
    assert [(d, s) for d, s in expect] == got
