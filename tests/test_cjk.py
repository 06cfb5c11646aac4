"""CJKAnalyzer / CJKBigramFilter analog: character bigrams over contiguous
CJK runs, script-split from latin text, batch path identical to the
driver-side path, and end-to-end search over a CJK corpus.
"""

import pandas as pd

from lucene_solr_spark.functions.analysis import cjk_analyzer


def test_cjk_bigrams_basic():
    a = cjk_analyzer()
    assert a.tokens("多くの学生") == ["多く", "くの", "の学", "学生"]


def test_lone_cjk_char_unigram():
    a = cjk_analyzer()
    # run of 1 emits the unigram (CJKBigramFilter single-token fallback)
    assert a.tokens("spark 字 engine") == ["spark", "字", "engine"]


def test_script_split_mixed_latin_cjk():
    a = cjk_analyzer()
    # latin words must not absorb adjacent CJK chars and vice versa
    assert a.tokens("abc漢字def") == ["abc", "漢字", "def"]
    assert a.tokens("テストok") == ["テス", "スト", "ok"]


def test_hangul_and_katakana_bigrams():
    a = cjk_analyzer()
    assert a.tokens("가나다") == ["가나", "나다"]
    assert a.tokens("カタカナ") == ["カタ", "タカ", "カナ"]


def test_stopwords_apply_to_latin_only_path():
    a = cjk_analyzer()
    assert a.tokens("the 漢字 index") == ["漢字", "index"]


def test_positions_advance_per_bigram():
    a = cjk_analyzer()
    got = a.tokens_with_positions("多くの el 学生")
    # 多くの -> bigrams at 0,1 ; el at 2 ; 学生 at 3
    assert got == [("多く", 0), ("くの", 1), ("el", 2), ("学生", 3)]


def test_batch_path_matches_driver_path():
    a = cjk_analyzer()
    texts = pd.Series(
        ["多くの学生が試験に落ちた", "spark 漢字テスト ok", "가나다 abc", "", "字"]
    )
    flat, rows, dl, pos = a.analyze_batch_with_positions(texts)
    for i, t in enumerate(texts):
        want = a.tokens_with_positions(t)
        got = [(term, p) for term, r, p in zip(flat, rows, pos) if r == i]
        assert got == want, i
        assert dl[i] == len(want)


def test_cjk_index_and_search(spark):
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import TermQuery

    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": ["多くの学生", "学生 spark", "の学び", "spark only"],
        }
    )
    corpus = spark.createDataFrame(pdf)
    idx = build_index(corpus, IndexConfig(analyzer=cjk_analyzer(), n_partitions=2))
    s = IndexSearcher(idx, corpus)
    hits = [d for d, _ in s.search(TermQuery("学生"), 10).collect()]
    assert set(hits) == {0, 1}
    # query normalization runs the same chain: a 3-char phrase-ish lookup
    hits2 = [d for d, _ in s.search(TermQuery("の学"), 10).collect()]
    assert set(hits2) == {0, 2}
