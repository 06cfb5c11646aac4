"""Function-query compiler + searchAfter paging."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.plans.function_queries import FunctionContext, compile_function
from lucene_solr_spark.plans.query import TermQuery


def _hot(searcher):
    return searcher.index.terms.orderBy(F.desc("df"), F.asc("term")).first()["term"]


def test_pure_arithmetic_functions(spark, searcher):
    ctx = FunctionContext(searcher)
    df = spark.range(1).select(
        compile_function("sum(1, 2, 3)", ctx).alias("a"),
        compile_function("product(2, 3, 4)", ctx).alias("b"),
        compile_function("recip(0, 1, 1000, 1000)", ctx).alias("c"),
        compile_function("linear(5, 2, 1)", ctx).alias("d"),
        compile_function("map(7, 0, 10, 99)", ctx).alias("e"),
        compile_function("map(70, 0, 10, 99)", ctx).alias("f"),
        compile_function("if(gt(3, 2), 10, 20)", ctx).alias("g"),
        compile_function("max(3, 9, 6)", ctx).alias("i"),
        compile_function("strdist('kitten', 'sitten', 'edit')", ctx).alias("j"),
    )
    r = df.collect()[0]
    assert (r["a"], r["b"], r["d"], r["e"], r["f"], r["g"]) == (6, 24, 11, 99, 70, 10)
    assert r["i"] == 9
    assert r["c"] == 1.0
    assert abs(r["j"] - (1 - 1 / 6)) < 1e-9


def test_index_coupled_constants(searcher):
    hot = _hot(searcher)
    ctx = FunctionContext(searcher)
    import pyspark.sql.functions as SF

    row = searcher.spark.range(1).select(
        compile_function(f"docfreq(text, '{hot}')", ctx).alias("df"),
        compile_function("numdocs()", ctx).alias("n"),
        compile_function("sumtotaltermfreq(text)", ctx).alias("sttf"),
        compile_function(f"idf(text, '{hot}')", ctx).alias("idf"),
    ).collect()[0]
    st = searcher._term_stats({hot})[hot]
    assert row["df"] == st[0]
    assert row["n"] == searcher.index.doc_count
    assert row["sttf"] == searcher.index.sum_ttf
    from lucene_solr_spark.functions import bm25

    assert row["idf"] == pytest.approx(float(bm25.idf(st[0], searcher.index.doc_count)))


def test_termfreq_and_rescoring(searcher, oracle):
    hot = _hot(searcher)
    top = searcher.function_query_score(
        TermQuery(hot), f"sum(termfreq(text, '{hot}'), 0)", k=10
    )
    got = top.df.collect()
    # rescored = f32(f64(bm25) * f64(tf)); verify against the raw scores+tf
    raw = {
        r["doc_id"]: (r["score"], r["tf"])
        for r in searcher._scored_postings(
            {hot: searcher._leaf_w(1.0, hot, searcher._term_stats({hot}))}
        ).collect()
    }
    for r in got:
        s, tf = raw[r["doc_id"]]
        assert np.float32(np.float64(s) * np.float64(tf)) == np.float32(r["score"])


def test_ord_rord(searcher, spark_corpus):
    ctx = FunctionContext(searcher)
    col = compile_function("ord(role)", ctx)
    rcol = compile_function("rord(role)", ctx)
    base = spark_corpus.select(F.col("doc_id"), "role")
    j = base
    for aux in ctx.joins.values():
        j = j.join(aux, "doc_id", "left")
    rows = j.select("role", col.alias("o"), rcol.alias("r")).distinct().collect()
    roles = sorted({r["role"] for r in rows})
    expect = {role: i + 1 for i, role in enumerate(roles)}
    rexpect = {role: len(roles) - i for i, role in enumerate(roles)}
    for r in rows:
        assert r["o"] == expect[r["role"]] and r["r"] == rexpect[r["role"]]


def test_unsupported_function_raises(searcher):
    with pytest.raises(ValueError):
        compile_function("geodist(1,2,3,4)", FunctionContext(searcher))


def test_search_after_pagination(searcher):
    hot = _hot(searcher)
    full = searcher.search(TermQuery(hot), 30).collect()
    p1 = searcher.search(TermQuery(hot), 10).collect()
    p2 = searcher.search_after(TermQuery(hot), 10, after=(p1[-1][1], p1[-1][0])).collect()
    p3 = searcher.search_after(TermQuery(hot), 10, after=(p2[-1][1], p2[-1][0])).collect()
    assert p1 + p2 + p3 == full
    # after=None degrades to plain search
    assert searcher.search_after(TermQuery(hot), 10).collect() == p1
