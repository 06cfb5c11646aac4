"""Control-vs-distributed rank-identity suite (FIXTURES.md §3).

Every query's top-10 (doc_ids AND float32 scores) from the Spark engine must
match the pure-Python oracle, and must be invariant to the number of index
partitions — the reference's BaseDistributedSearchTestCase pattern.
"""

import numpy as np
import pytest

from lucene_solr_spark.plans.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermQuery,
)


def _terms_by_df(oracle):
    by_df = sorted(oracle.postings.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    hot = by_df[0][0]
    hot2 = by_df[1][0]
    rare = next(t for t, p in by_df if 1 <= len(p) <= 3)
    rares = [t for t, p in by_df if 1 <= len(p) <= 3][:4]
    mid = next(t for t, p in by_df if 20 <= len(p) <= 60)
    return hot, hot2, rare, rares, mid


def _assert_rank_identical(got, exp, context=""):
    assert [d for d, _ in got] == [d for d, _ in exp], f"{context}: doc_ids differ\n got={got}\n exp={exp}"
    for (d1, s1), (d2, s2) in zip(got, exp):
        assert s1 == pytest.approx(s2, rel=1e-6, abs=1e-7), f"{context}: score of doc {d1}: {s1} vs {s2}"


def _check(searcher, oracle, query, k=10, prune_both=False, context=""):
    exp = oracle.search(query, k)
    got = searcher.search(query, k, prune=False).collect()
    _assert_rank_identical(got, exp, context + "[exact]")
    if prune_both:
        got_p = searcher.search(query, k, prune=True).collect()
        _assert_rank_identical(got_p, exp, context + "[pruned]")


# --------------------------------------------------- FIXTURES §3 query set
def test_q1_single_hot_term(searcher, oracle):
    hot, *_ = _terms_by_df(oracle)
    _check(searcher, oracle, TermQuery(hot), prune_both=True, context="q1")


def test_q2_single_rare_term(searcher, oracle):
    _, _, rare, _, _ = _terms_by_df(oracle)
    _check(searcher, oracle, TermQuery(rare), prune_both=True, context="q2")


def test_q3_absent_term(searcher, oracle):
    q = TermQuery("zzzmissingterm")
    assert oracle.search(q, 10) == []
    assert searcher.search(q, 10, prune=False).collect() == []
    assert searcher.search(q, 10, prune=True).collect() == []


def test_q4_two_term_and(searcher, oracle):
    hot, hot2, *_ = _terms_by_df(oracle)
    _check(searcher, oracle, BooleanQuery.build(must=[TermQuery(hot), TermQuery(hot2)]), context="q4")


def test_q5_two_term_or(searcher, oracle):
    hot, _, _, _, mid = _terms_by_df(oracle)
    _check(searcher, oracle, BooleanQuery.build(should=[TermQuery(hot), TermQuery(mid)]), prune_both=True, context="q5")


def test_q6_hot_plus_rare_or(searcher, oracle):
    hot, _, _, rares, _ = _terms_by_df(oracle)
    q = BooleanQuery.build(should=[TermQuery(hot)] + [TermQuery(r) for r in rares])
    _check(searcher, oracle, q, prune_both=True, context="q6")


def test_q7_min_should_match(searcher, oracle):
    hot, hot2, _, _, mid = _terms_by_df(oracle)
    q = BooleanQuery.build(should=[TermQuery(hot), TermQuery(hot2), TermQuery(mid)], minimum_should_match=2)
    _check(searcher, oracle, q, context="q7")


def test_q8_must_plus_must_not(searcher, oracle):
    hot, hot2, *_ = _terms_by_df(oracle)
    q = BooleanQuery.build(must=[TermQuery(hot)], must_not=[TermQuery(hot2)])
    _check(searcher, oracle, q, context="q8")


def test_q9_long_token_docs(searcher, oracle):
    # 300-char 'q'*300 token was skipped at index time: absent from the index
    q = TermQuery("q" * 300)
    assert searcher.search(q, 10, prune=False).collect() == []
    # but those docs are searchable by their other terms
    some_doc = next(iter(oracle.postings.get("the", {})), None)
    if some_doc is not None:
        _check(searcher, oracle, TermQuery("the"), context="q9b")


def test_q10_stopword_only_query(searcher, oracle):
    # standard analyzer has no stopwords; emulate with english analyzer parse
    from lucene_solr_spark.functions.analysis import english_analyzer
    from lucene_solr_spark.plans.parser import parse_query

    q = parse_query("the and of", english_analyzer())
    assert isinstance(q, MatchNoDocsQuery)
    assert searcher.search(q, 10).collect() == []


def test_q11_mixed_case_normalization(searcher, oracle):
    from lucene_solr_spark.functions.analysis import standard_analyzer
    from lucene_solr_spark.plans.parser import parse_query

    hot, *_ = _terms_by_df(oracle)
    q = parse_query(hot.upper(), standard_analyzer())
    assert q == TermQuery(hot)
    _check(searcher, oracle, q, context="q11")


def test_q12_tie_break(searcher, oracle):
    # constant-score over a prefix produces exact ties -> doc_id asc order
    hot, *_ = _terms_by_df(oracle)
    q = ConstantScoreQuery(TermQuery(hot), boost=2.5)
    got = searcher.search(q, 10, prune=False).collect()
    exp = oracle.search(q, 10)
    _assert_rank_identical(got, exp, "q12")
    assert [d for d, _ in got] == sorted(d for d, _ in got)


# ----------------------------------------------------- other query operators
def test_phrase_query(searcher, oracle):
    # find a phrase that actually occurs: first two tokens of some doc
    from lucene_solr_spark.functions.analysis import standard_analyzer

    an = standard_analyzer()
    for d in sorted(oracle.texts)[:50]:
        toks = an.tokens(oracle.texts[d])
        if len(toks) >= 2 and toks[0] != toks[1]:
            phrase = (toks[0], toks[1])
            break
    q = PhraseQuery(phrase)
    _check(searcher, oracle, q, context="phrase")
    assert oracle.search(q, 10)  # non-empty


def test_synonym_query(searcher, oracle):
    hot, _, rare, _, mid = _terms_by_df(oracle)
    _check(searcher, oracle, SynonymQuery((rare, mid)), context="synonym")


def test_prefix_query(searcher, oracle):
    _, _, _, _, mid = _terms_by_df(oracle)
    q = PrefixQuery(mid[:3])
    _check(searcher, oracle, q, context="prefix")


def test_dismax(searcher, oracle):
    hot, _, _, _, mid = _terms_by_df(oracle)
    q = DisjunctionMaxQuery((TermQuery(hot), TermQuery(mid)), tie_breaker=0.3)
    _check(searcher, oracle, q, context="dismax")


def test_boost_and_nested_boolean(searcher, oracle):
    hot, hot2, _, _, mid = _terms_by_df(oracle)
    inner = BooleanQuery.build(should=[TermQuery(hot2), TermQuery(mid)])
    q = BooleanQuery.build(must=[TermQuery(hot), BoostQuery(inner, 2.0)])
    _check(searcher, oracle, q, context="nested")


def test_match_all(searcher, oracle):
    got = searcher.search(MatchAllQuery(), 10).collect()
    exp = oracle.search(MatchAllQuery(), 10)
    _assert_rank_identical(got, exp, "matchall")


def test_filter_clause(searcher, oracle):
    hot, _, _, _, mid = _terms_by_df(oracle)
    q = BooleanQuery.build(must=[TermQuery(hot)], filter=[TermQuery(mid)])
    _check(searcher, oracle, q, context="filter")


def test_count(searcher, oracle):
    hot, *_ = _terms_by_df(oracle)
    assert searcher.count(TermQuery(hot)) == oracle.count(TermQuery(hot))


def test_fetch_stored_fields(searcher, oracle):
    hot, *_ = _terms_by_df(oracle)
    top = searcher.search(TermQuery(hot), 5)
    rows = searcher.fetch(top, columns=["conv_id", "turn_idx", "text"]).collect()
    assert len(rows) == 5
    assert all(r["text"] is not None for r in rows)


# -------------------------------------------- partitioning invariance (1, 8)
@pytest.mark.parametrize("n_parts", [1, 3])
def test_partitioning_invariance(spark_corpus, oracle, n_parts):
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    idx = build_index(spark_corpus, IndexConfig(n_partitions=n_parts))
    s = IndexSearcher(idx, prune_min_postings=0)
    hot, hot2, rare, _, mid = _terms_by_df(oracle)
    for q in [TermQuery(hot), BooleanQuery.build(should=[TermQuery(rare), TermQuery(mid)])]:
        got = s.search(q, 10, prune=True).collect()
        exp = oracle.search(q, 10)
        _assert_rank_identical(got, exp, f"parts={n_parts}")


def test_doc_id_stability_across_input_partitioning(spark, fixture_corpus_pdf):
    from lucene_solr_spark.operators.indexer import assign_doc_ids

    df4 = spark.createDataFrame(fixture_corpus_pdf).repartition(4)
    df16 = spark.createDataFrame(fixture_corpus_pdf.sample(frac=1.0, random_state=7)).repartition(16)
    a = assign_doc_ids(df4, ("conv_id", "turn_idx"), 4).select("doc_id", "conv_id", "turn_idx")
    b = assign_doc_ids(df16, ("conv_id", "turn_idx"), 16).select("doc_id", "conv_id", "turn_idx")
    pa = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert pa.equals(pb)


def test_index_stats_match_oracle(index8, oracle):
    assert index8.doc_count == oracle.doc_count
    assert index8.sum_ttf == oracle.sum_ttf
    assert float(index8.avgdl) == float(oracle.avgdl)


def test_terms_table_matches_oracle(index8, oracle):
    rows = index8.terms.collect()
    got = {r["term"]: (r["df"], r["ttf"]) for r in rows}
    exp = {t: (len(p), sum(p.values())) for t, p in oracle.postings.items()}
    assert got == exp


def test_index_write_read_roundtrip(tmp_path, spark, index8, oracle):
    from lucene_solr_spark.operators.indexer import InvertedIndex
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import TermQuery

    path = str(tmp_path / "idx")
    index8.write(path)
    idx2 = InvertedIndex.read(spark, path, index8.config)
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    got = IndexSearcher(idx2).search(TermQuery(hot), 10).collect()
    exp = oracle.search(TermQuery(hot), 10)
    _assert_rank_identical(got, exp, "roundtrip")


# ------------------------------------------------ codec SPI: for128 postings
def test_for128_codec_rank_identity(spark_corpus, oracle):
    """The FOR-128 bit-packed postings format (PostingsFormat-SPI analog) is
    a drop-in for the varint codec: identical top-k, scores, phrase results,
    and a strictly-smaller payload on this corpus."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher

    idx = build_index(
        spark_corpus, IndexConfig(n_partitions=3, index_positions=True, codec="for128")
    ).persist()
    s = IndexSearcher(idx, prune_min_postings=0)
    hot, hot2, rare, _, mid = _terms_by_df(oracle)
    for q in [
        TermQuery(hot),
        BooleanQuery.build(should=[TermQuery(rare), TermQuery(mid)]),
        BooleanQuery.build(must=[TermQuery(hot), TermQuery(mid)]),
    ]:
        got = s.search(q, 10, prune=True).collect()
        exp = oracle.search(q, 10)
        _assert_rank_identical(got, exp, "for128")
    # positional path decodes identically too
    ph = PhraseQuery([hot, hot2])
    got_ph = {d for d, _ in s.search(ph, 20).collect()}
    exp_ph = {d for d, _ in oracle.search(ph, 20)}
    assert got_ph == exp_ph

    # size sanity: FOR trades per-value adaptivity for fixed-width bulk
    # decode; on a tiny corpus (mostly tail blocks + skewed deltas) it may
    # run slightly larger than varint, but never pathologically so
    sz = idx.postings.agg(
        F.sum(F.octet_length("doc_ids") + F.octet_length("tfs")).alias("b")
    ).collect()[0]["b"]
    idx_v = build_index(spark_corpus, IndexConfig(n_partitions=3, index_positions=True))
    sz_v = idx_v.postings.agg(
        F.sum(F.octet_length("doc_ids") + F.octet_length("tfs")).alias("b")
    ).collect()[0]["b"]
    assert sz < 1.5 * sz_v


def test_for128_merge_roundtrip(spark_corpus, oracle):
    """merge_runs repacks under the index's codec — postings and ranks
    survive a 3→1 forced merge of a for128 index."""
    from lucene_solr_spark.operators.indexer import IndexConfig, build_index
    from lucene_solr_spark.operators.merge import force_merge
    from lucene_solr_spark.operators.searcher import IndexSearcher

    idx = build_index(spark_corpus, IndexConfig(n_partitions=3, codec="for128")).persist()
    merged = force_merge(idx)
    hot, _, rare, _, mid = _terms_by_df(oracle)
    q = BooleanQuery.build(should=[TermQuery(hot), TermQuery(rare)])
    got = IndexSearcher(merged).search(q, 10).collect()
    exp = oracle.search(q, 10)
    _assert_rank_identical(got, exp, "for128-merged")
