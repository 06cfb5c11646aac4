"""Porter stemmer + full English analysis chain.

The strong check: the reference ships Martin Porter's 23,531-word test
vocabulary (``porterTestData.zip`` next to its PorterStemmer tests); our
stemmer must agree on every word.  The chain tests pin the
EnglishAnalyzer ordering (possessive → lower → stop → stem) and the
batch/scalar-path equivalence the index build depends on.
"""

import io
import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions.analysis import (
    english_analyzer_porter,
    standard_analyzer,
)
from lucene_solr_spark.functions.porterstem import porter_stem

_REF_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/porterTestData.zip"
)


@pytest.mark.skipif(not os.path.exists(_REF_ZIP), reason="reference test data absent")
def test_full_reference_vocabulary():
    with zipfile.ZipFile(_REF_ZIP) as z:
        voc = io.TextIOWrapper(z.open("voc.txt")).read().split()
        out = io.TextIOWrapper(z.open("output.txt")).read().split()
    assert len(voc) == len(out) == 23531
    mismatches = [(v, o, porter_stem(v)) for v, o in zip(voc, out) if porter_stem(v) != o]
    assert mismatches == []


def test_known_stems():
    # spot checks incl. the two revised rules (bli->ble, logi->log)
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubling": "troubl", "sized": "size", "hopping": "hop", "failing": "fail",
        "happy": "happi", "sky": "sky", "relational": "relat", "rational": "ration",
        "possibli": "possibl", "analogousli": "analog", "vietnamization": "vietnam",
        "probate": "probat", "controll": "control", "roll": "roll",
        "archaeology": "archaeolog", "the": "the", "be": "be",
    }
    for w, s in cases.items():
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_english_chain_order_and_possessive():
    an = english_analyzer_porter()
    # "it's" -> possessive strip -> "it" -> stopped (chain order matters:
    # stop AFTER possessive, stem AFTER stop)
    assert an.tokens("it's running") == ["run"]
    # "dog's" -> "dog"; stopwords are matched unstemmed ("these" stopped,
    # but "this" would stem to "thi" if stemming ran before stop)
    assert an.tokens("these dog's bones") == ["dog", "bone"]
    # unicode apostrophe possessive
    assert an.tokens("john’s book") == ["john", "book"]
    # stemming does not resurrect stopwords: "ties" stems to "ti", kept
    assert an.tokens("ties") == ["ti"]


def test_batch_matches_scalar_path():
    an = english_analyzer_porter()
    texts = pd.Series(
        [
            "The system's agreements were finalized quickly",
            "it's a troubling conflated analysis",
            None,
            "",
            "Sizing and hopping; the ponies' caresses",
            "john’s RUNNING dogs e'en o'clock's",
        ]
    )
    flat, rows, dl, pos = an.analyze_batch_with_positions(texts)
    expected = []
    for i, t in enumerate(texts):
        for tok, p in an.tokens_with_positions(t):
            expected.append((i, tok, p))
    got = list(zip(rows.tolist(), flat.tolist(), pos.tolist()))
    assert got == expected
    # dl counts kept tokens only
    for i in range(len(texts)):
        assert dl[i] == len(an.tokens_with_positions(texts[i]))


def test_encoded_path_falls_back_bit_identically():
    an = english_analyzer_porter()
    texts = pd.Series(["The system's agreements were finalized", "running runs ran"])
    flat, rows, dl, pos = an.analyze_batch_with_positions(texts)
    codes, uniques, rows2, dl2, pos2 = an.analyze_batch_encoded(texts)
    flat2 = np.asarray(uniques, dtype=object)[codes]
    assert list(flat) == list(flat2)
    assert (rows == rows2).all() and (dl == dl2).all() and (pos == pos2).all()
    ref_codes, ref_uniq = pd.factorize(pd.Series(flat), sort=True)
    assert (codes == ref_codes).all()


def test_standard_analyzer_unchanged():
    # the default chain has no possessive strip / stemmer
    an = standard_analyzer()
    assert an.tokens("the system's agreements") == ["the", "system's", "agreements"]


def test_s_stemmer_minimal_english():
    from lucene_solr_spark.functions.analysis import Analyzer, _STANDARD_PATTERN
    from lucene_solr_spark.functions.porterstem import s_stem

    # EnglishMinimalStemmer semantics (Harman S-stemmer)
    cases = {
        "dogs": "dog", "cats": "cat", "ponies": "pony", "ties": "ty",
        "caress": "caress", "focus": "focus", "gas": "ga", "as": "as",
        "dies": "dy", "aes": "aes", "goes": "goes", "does": "does",
        "classes": "classe", "bus": "bus", "tables": "table",
    }
    for w, s in cases.items():
        assert s_stem(w) == s, (w, s_stem(w), s)

    an = Analyzer(pattern=_STANDARD_PATTERN, stemmer="minimal_english")
    assert an.tokens("the dogs and ponies") == ["the", "dog", "and", "pony"]


def test_porter_chain_rank_identity_spark(spark, fixture_corpus_pdf):
    """Control-vs-distributed under the FULL English chain: the Spark index
    built with english_analyzer_porter must be rank- and score-identical to
    the scalar oracle engine using the same analyzer."""
    from lucene_solr_spark.functions.analysis import english_analyzer_porter
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import BooleanQuery, TermQuery
    from lucene_solr_spark.testing.oracle import OracleEngine

    an = english_analyzer_porter()
    pdf = fixture_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = OracleEngine(zip(range(len(pdf)), pdf["text"]), an)

    corpus = assign_doc_ids(spark.createDataFrame(pdf), ("conv_id", "turn_idx"), n_partitions=8)
    idx = build_index(corpus, IndexConfig(analyzer=an, n_partitions=8))
    s = IndexSearcher(idx)

    # pick stemmed terms straight from the oracle's dictionary
    hot = sorted(oracle.postings, key=lambda t: (-len(oracle.postings[t]), t))[:3]
    queries = [
        TermQuery(hot[0]),
        BooleanQuery.build(must=[TermQuery(hot[0]), TermQuery(hot[1])]),
        BooleanQuery.build(should=[TermQuery(hot[1]), TermQuery(hot[2])]),
    ]
    for q in queries:
        expect = [(d, float(np.float32(sc))) for d, sc in oracle.search(q, 10)]
        got = [(d, float(np.float32(sc))) for d, sc in s.search(q, 10).collect()]
        assert got == expect, (q, got[:3], expect[:3])
