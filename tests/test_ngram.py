"""NGramTokenFilter / EdgeNGramTokenFilter: gram tables, LUCENE-7960
same-position semantics, preserve_original, field-length accounting, batch
parity, and an end-to-end edge-gram index search."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions.analysis import (
    Analyzer,
    edge_ngram_analyzer,
    ngram_analyzer,
)


def test_ngram_gram_table():
    a = ngram_analyzer(2, 3)
    # per offset, sizes ascending (NGramTokenFilter state machine)
    assert a.tokens("abcd") == ["ab", "abc", "bc", "bcd", "cd"]
    assert a.tokens("ab") == ["ab"]
    assert a.tokens("a") == []  # shorter than min_gram, no preserve


def test_edge_ngram_gram_table():
    e = edge_ngram_analyzer(2, 4)
    assert e.tokens("abcdef") == ["ab", "abc", "abcd"]
    assert e.tokens("abc") == ["ab", "abc"]
    assert e.tokens("x") == []


def test_preserve_original():
    p = Analyzer(edge_ngrams=(3, 4, True))
    assert p.tokens("ab") == ["ab"]  # shorter than min -> original kept
    assert p.tokens("abcdefgh") == ["abc", "abcd", "abcdefgh"]  # longer than max
    assert p.tokens("abcd") == ["abc", "abcd"]  # in range -> no duplicate
    n = Analyzer(ngrams=(2, 2, True))
    assert n.tokens("a") == ["a"]


def test_positions_shared_and_dl():
    a = ngram_analyzer(2, 3)
    # all grams of a token at the source position (LUCENE-7960)
    assert a.tokens_with_positions("abcd xy") == [
        ("ab", 0), ("abc", 0), ("bc", 0), ("bcd", 0), ("cd", 0), ("xy", 1),
    ]
    flat, rows, dl, pos = a.analyze_batch_with_positions(pd.Series(["abcd xy", "a", ""]))
    # dl counts one gram per EMITTING source token
    assert list(dl) == [2, 0, 0]
    assert list(pos) == [0, 0, 0, 0, 0, 1]


def test_validation():
    with pytest.raises(ValueError):
        Analyzer(ngrams=(0, 2))
    with pytest.raises(ValueError):
        Analyzer(ngrams=(3, 2))
    with pytest.raises(ValueError):
        Analyzer(ngrams=(2, 3), edge_ngrams=(2, 3))
    with pytest.raises(ValueError):
        Analyzer(ngrams=(2, 3), shingles=True)


@pytest.mark.parametrize(
    "factory",
    [lambda: ngram_analyzer(2, 3), lambda: edge_ngram_analyzer(2, 4), lambda: Analyzer(ngrams=(1, 2, True))],
)
def test_batch_scalar_parity(factory):
    an = factory()
    texts = ["abcd a xy", "hello world", "", "x", "abc ab abcd abc", None]
    flat, rows, dl, pos = an.analyze_batch_with_positions(pd.Series(texts))
    got = [[] for _ in texts]
    for t, r, p in zip(flat, rows, pos):
        got[r].append((t, int(p)))
    assert got == [an.tokens_with_positions(t) for t in texts]
    # dl parity: emitting-source-token count per row
    for i, t in enumerate(texts):
        srcs = Analyzer().tokens(t or "")
        want = sum(1 for s in srcs if an._gram_expand(s))
        assert dl[i] == want, (t, dl[i], want)


def test_edge_ngram_index_end_to_end(spark, fixture_corpus_pdf):
    """Search-as-you-type: 'sca' prefix gram scores against a hand-computed
    BM25 over the gram statistics."""
    import math

    from lucene_solr_spark.functions.smallfloat import byte4_to_int, int_to_byte4
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import TermQuery

    an = edge_ngram_analyzer(2, 4)
    pdf = fixture_corpus_pdf.head(400).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    corpus = assign_doc_ids(df, ("conv_id", "turn_idx"), n_partitions=8)
    idx = build_index(corpus, IndexConfig(n_partitions=8, analyzer=an))
    s = IndexSearcher(idx, corpus)

    base = Analyzer()
    tf, dl = {}, {}
    for doc_id, text in enumerate(pdf["text"]):
        srcs = base.tokens(text)
        dl[doc_id] = sum(1 for t in srcs if len(t) >= 2)
        c = sum(1 for t in srcs if len(t) >= 3 and t[:3] == "sca")
        if c:
            tf[doc_id] = c
    n = len(pdf)
    sttf = sum(dl.values())
    avgdl = np.float32(np.float64(sttf) / n)
    dfq = len(tf)
    idf = np.float32(math.log(1 + (n - dfq + 0.5) / (dfq + 0.5)))
    expect = {}
    for d, f in tf.items():
        dlq = float(byte4_to_int(int_to_byte4(np.array([dl[d]])))[0])
        cache = np.float32(np.float32(1.2) * np.float32(np.float32(0.25) + np.float32(np.float32(np.float32(0.75) * np.float32(dlq)) / avgdl)))
        expect[d] = float(np.float32(idf * np.float32(f / (f + float(cache)))))
    got = s.search(TermQuery("sca"), 10).collect()
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(d, sc) for d, sc in got] == want


def test_length_filter_and_keyword_marker():
    """LengthFilter holes + KeywordMarkerFilter stem protection."""
    a = Analyzer(length_filter=(3, 5))
    assert a.tokens("ab abc abcdef world xy") == ["abc", "world"]
    # holes preserved (FilteringTokenFilter position increments)
    assert a.tokens_with_positions("ab abc abcdef world") == [("abc", 1), ("world", 3)]
    flat, rows, dl, pos = a.analyze_batch_with_positions(pd.Series(["ab abc abcdef world", ""]))
    assert list(flat) == ["abc", "world"] and list(pos) == [1, 3] and list(dl) == [2, 0]
    # encoded path parity (pure-ASCII fast tokenizer applies the same mask)
    codes, uniques, rows2, dl2, pos2 = a.analyze_batch_encoded(pd.Series(["ab abc abcdef world", ""]))
    assert list(uniques[codes]) == ["abc", "world"] and list(pos2) == [1, 3] and list(dl2) == [2, 0]

    k = Analyzer(stemmer="porter", keyword_terms=("running",))
    assert k.tokens("running jumping") == ["running", "jump"]
    flat, _, _, _ = k.analyze_batch_with_positions(pd.Series(["running jumping"]))
    assert list(flat) == ["running", "jump"]


def test_common_grams_reference_example():
    """CommonGramsFilter javadoc example: 'the rain in spain falls mainly'."""
    cg = Analyzer(common_grams=("the", "in"), max_token_length=0)
    assert cg.tokens("the rain in spain falls mainly") == [
        "the", "the_rain", "rain", "rain_in", "in", "in_spain", "spain", "falls", "mainly",
    ]
    # grams share the first token's position (posIncrement 0)
    assert cg.tokens_with_positions("the rain in spain") == [
        ("the", 0), ("the_rain", 0), ("rain", 1), ("rain_in", 1),
        ("in", 2), ("in_spain", 2), ("spain", 3),
    ]
    # CommonGramsQueryFilter: drop unigrams that joined a gram
    q = Analyzer(common_grams=("the", "in"), common_grams_query=True, max_token_length=0)
    assert q.tokens("the rain in spain falls mainly") == [
        "the_rain", "rain_in", "in_spain", "falls", "mainly",
    ]
    assert q.tokens("the") == ["the"]  # lone common word survives
    assert q.tokens("falls mainly") == ["falls", "mainly"]


def test_common_grams_batch_parity_and_dl():
    cg = Analyzer(common_grams=("the", "in"), max_token_length=0)
    texts = ["the rain in spain falls mainly", "x y", "", "the the the"]
    flat, rows, dl, pos = cg.analyze_batch_with_positions(pd.Series(texts))
    got = [[] for _ in texts]
    for t, r, p in zip(flat, rows, pos):
        got[r].append((t, int(p)))
    assert got == [cg.tokens_with_positions(t) for t in texts]
    # grams are overlap tokens: dl counts unigrams only
    assert list(dl) == [6, 2, 0, 3]


def test_common_grams_validation():
    with pytest.raises(ValueError):
        Analyzer(common_grams=("the",), shingles=True, max_token_length=0, stopwords=frozenset())
    with pytest.raises(ValueError):
        Analyzer(common_grams=("the",))  # default max_token_length breaks hole-freeness
    with pytest.raises(ValueError):
        Analyzer(common_grams_query=True, max_token_length=0)
    with pytest.raises(NotImplementedError):
        Analyzer(
            common_grams=("the",), common_grams_query=True, max_token_length=0
        ).analyze_batch_with_positions(pd.Series(["the rain"]))


def test_pattern_replace_filter():
    """PatternReplaceFilter: per-token regex replace, 1:1 (positions and dl
    unchanged); replaceAll default, replaceFirst with all=False."""
    a = Analyzer(pattern_replace=(r"\d+", "#"))
    assert a.tokens("abc123def x42 plain") == ["abc#def", "x#", "plain"]
    first = Analyzer(pattern_replace=(r"o", "0", False))
    assert first.tokens("foooo book") == ["f0ooo", "b0ok"]
    flat, rows, dl, pos = a.analyze_batch_with_positions(pd.Series(["abc123def x42 plain", ""]))
    assert list(flat) == ["abc#def", "x#", "plain"] and list(dl) == [3, 0] and list(pos) == [0, 1, 2]
    # encoded path falls back and stays bit-identical
    codes, uniques, _, dl2, _ = a.analyze_batch_encoded(pd.Series(["abc123def x42 plain", ""]))
    assert list(uniques[codes]) == ["abc#def", "x#", "plain"] and list(dl2) == [3, 0]
    # chain spot: replace BEFORE stemming
    k = Analyzer(stemmer="porter", pattern_replace=(r"ization$", "ize"))
    assert k.tokens("organization") == [__import__("lucene_solr_spark.functions.porterstem", fromlist=["porter_stem"]).porter_stem("organize")]


def test_truncate_token_filter():
    """TruncateTokenFilter: cap tokens at n chars; keyword terms exempt."""
    a = Analyzer(truncate=4, keyword_terms=("protected",))
    assert a.tokens("abcdefgh ab protected") == ["abcd", "ab", "protected"]
    flat, _, dl, pos = a.analyze_batch_with_positions(pd.Series(["abcdefgh ab protected"]))
    assert list(flat) == ["abcd", "ab", "protected"] and list(dl) == [3]
    # encoded fast path falls back bit-identically
    codes, uniques, _, _, _ = a.analyze_batch_encoded(pd.Series(["abcdefgh ab protected"]))
    assert list(uniques[codes]) == ["abcd", "ab", "protected"]


def test_elision_filter():
    """ElisionFilter: strip listed article + apostrophe (both ' and U+2019);
    non-article prefixes untouched (ElisionFilter.java:51-70)."""
    from lucene_solr_spark.functions.analysis import french_elision_articles

    a = Analyzer(elision=french_elision_articles())
    assert a.tokens("l'avion d'abord xyz'rest qu'il jusqu'au") == [
        "avion", "abord", "xyz'rest", "il", "au",
    ]
    assert a.tokens("c’est") == ["est"]  # U+2019 apostrophe
    flat, _, dl, _ = a.analyze_batch_with_positions(pd.Series(["l'avion d'abord xyz'rest"]))
    assert list(flat) == ["avion", "abord", "xyz'rest"] and list(dl) == [3]
