"""Keyword/point field queries (StringField / PointRangeQuery analogs).

Field predicates must evaluate against corpus columns via Catalyst (pushed
into the scan), combine with scored text clauses in booleans, and parse from
the classic ``field:value`` / ``field:[a TO b]`` syntax.
"""

import numpy as np
import pytest

from lucene_solr_spark.functions.analysis import standard_analyzer
from lucene_solr_spark.plans.parser import parse_query
from lucene_solr_spark.plans.query import (
    BooleanQuery,
    FieldRangeQuery,
    FieldTermQuery,
    PhraseQuery,
    TermQuery,
    TermRangeQuery,
)


def test_parser_field_syntax():
    an = standard_analyzer()
    q = parse_query("role:assistant +tool:bash error", an)
    kinds = [(type(c.query).__name__, c.occur) for c in q.clauses]
    assert kinds == [
        ("FieldTermQuery", "SHOULD"),
        ("FieldTermQuery", "MUST"),
        ("TermQuery", "SHOULD"),
    ]
    assert q.clauses[0].query == FieldTermQuery("role", "assistant")
    assert q.clauses[1].query == FieldTermQuery("tool", "bash")

    r = parse_query("n_chars:[100 TO 200]", an)
    assert r == FieldRangeQuery("n_chars", 100, 200, True, True)
    r2 = parse_query("n_chars:{100 TO *}", an)
    assert r2 == FieldRangeQuery("n_chars", 100, None, False, False)

    # the default field re-enters text analysis (term / phrase / range)
    assert parse_query("text:Scan", an) == TermQuery("scan")
    assert parse_query('text:"big scan"', an) == PhraseQuery(("big", "scan"))
    assert parse_query("text:[apple TO cherry]", an) == TermRangeQuery("apple", "cherry", True, True)


def test_field_filter_results(searcher, spark_corpus, oracle):
    # corpus columns: conv_id, turn_idx, role, text, tool, ts
    roles = {r["doc_id"]: r["role"] for r in spark_corpus.select("doc_id", "role").collect()}
    hot = searcher.index.terms.orderBy("df", ascending=False).first()["term"]

    q = BooleanQuery.build(must=[TermQuery(hot)], filter=[FieldTermQuery("role", "user")])
    got = searcher.search(q, 10).collect()
    assert len(got) > 0
    assert all(roles[d] == "user" for d, _ in got)

    # FILTER is non-scoring: scores equal the bare term query's on those docs
    bare = dict(searcher.search(TermQuery(hot), 10_000).collect())
    assert all(bare[d] == s for d, s in got)

    # MUST field clause adds constant f32(1.0) to the double-summed score
    q2 = BooleanQuery.build(must=[TermQuery(hot), FieldTermQuery("role", "user")])
    got2 = searcher.search(q2, 10).collect()
    assert all(np.float32(1.0 + np.float64(bare[d])) == np.float32(s) for d, s in got2)

    # MUST_NOT field clause excludes
    q3 = BooleanQuery.build(must=[TermQuery(hot)], must_not=[FieldTermQuery("role", "user")])
    got3 = searcher.search(q3, 10).collect()
    assert got3 and all(roles[d] != "user" for d, _ in got3)


def test_field_range_results(searcher, spark_corpus):
    hot = searcher.index.terms.orderBy("df", ascending=False).first()["term"]
    idx = {r["doc_id"]: r["turn_idx"] for r in spark_corpus.select("doc_id", "turn_idx").collect()}
    q = BooleanQuery.build(must=[TermQuery(hot)], filter=[FieldRangeQuery("turn_idx", 2, 5)])
    got = searcher.search(q, 20).collect()
    assert got and all(2 <= idx[d] <= 5 for d, _ in got)
    q2 = BooleanQuery.build(must=[TermQuery(hot)], filter=[FieldRangeQuery("turn_idx", 2, 5, False, False)])
    got2 = searcher.search(q2, 20).collect()
    assert got2 and all(2 < idx[d] < 5 for d, _ in got2)


def test_field_predicate_pushdown(spark, tmp_path_factory, spark_corpus, index8):
    """The field predicate must reach the parquet scan (PushedFilters), not
    be applied post-scan — at 10^12 rows that's the difference between
    reading one partition and reading the table."""
    from lucene_solr_spark.operators.searcher import IndexSearcher

    path = str(tmp_path_factory.mktemp("fq_corpus")) + "/corpus.parquet"
    spark_corpus.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    s = IndexSearcher(index8, corpus)
    plan = s._eval_field(FieldTermQuery("role", "user"), 1.0)
    text = plan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in text, text
    pushed = text.split("PushedFilters")[1][:200]
    assert "role" in pushed, text


def test_field_query_requires_corpus(index8):
    from lucene_solr_spark.operators.searcher import IndexSearcher

    s = IndexSearcher(index8)  # no corpus bound
    with pytest.raises(ValueError):
        s.search(FieldTermQuery("role", "user"), 5)


def test_field_in_set_results(searcher, spark_corpus):
    from lucene_solr_spark.plans.query import FieldInSetQuery

    roles = {r["doc_id"]: r["role"] for r in spark_corpus.select("doc_id", "role").collect()}
    want = sorted(d for d, ro in roles.items() if ro in ("user", "tool"))
    got = searcher._evaluate(FieldInSetQuery("role", ("user", "tool")), 1.0, {})
    rows = got.collect()
    assert sorted(r["doc_id"] for r in rows) == want and len(want) > 0
    assert all(float(np.float32(r["score"])) == 1.0 for r in rows)  # constant score

    # numeric doc-values set (DocValuesNumbersQuery)
    idxs = {r["doc_id"]: r["turn_idx"] for r in spark_corpus.select("doc_id", "turn_idx").collect()}
    want2 = sorted(d for d, ti in idxs.items() if ti in (0, 3))
    got2 = searcher._evaluate(FieldInSetQuery("turn_idx", (0, 3)), 1.0, {})
    assert sorted(r["doc_id"] for r in got2.collect()) == want2
