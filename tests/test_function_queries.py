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


def test_math_and_date_functions(spark, searcher):
    import math

    ctx = FunctionContext(searcher)
    row = (
        spark.range(1)
        .select(
            compile_function("sin(0.5)", ctx).alias("s"),
            compile_function("atan2(1, 1)", ctx).alias("a2"),
            compile_function("hypot(3, 4)", ctx).alias("h"),
            compile_function("ceil(1.2)", ctx).alias("ce"),
            compile_function("floor(1.8)", ctx).alias("fl"),
            compile_function("rint(2.5)", ctx).alias("ri"),
            compile_function("deg(pi())", ctx).alias("dg"),
            compile_function("cbrt(27)", ctx).alias("cb"),
            compile_function("tanh(0.25)", ctx).alias("th"),
            compile_function("ms('2020-01-02', '2020-01-01')", ctx).alias("ms2"),
        )
        .collect()[0]
    )
    assert row["s"] == math.sin(0.5)
    assert row["a2"] == math.atan2(1, 1)
    assert row["h"] == 5.0 and row["ce"] == 2.0 and row["fl"] == 1.0
    assert row["ri"] == 2.0  # Math.rint half-to-even
    assert abs(row["dg"] - 180.0) < 1e-9 and abs(row["cb"] - 3.0) < 1e-12
    assert row["th"] == math.tanh(0.25)
    assert row["ms2"] == 86_400_000  # one day, timezone-independent
    with pytest.raises(ValueError):
        compile_function("ms()", ctx)  # NOW is nondeterministic


def test_maxdoc_vs_numdocs(spark):
    import pandas as pd

    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.plans.query import TermQuery

    rows = [("c0", 0, "alpha beta"), ("c1", 0, "beta gamma"), ("c2", 0, "alpha gamma")]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    corpus = assign_doc_ids(spark.createDataFrame(pdf), ("conv_id", "turn_idx"), 2).persist()
    s = IndexSearcher(build_index(corpus, IndexConfig(n_partitions=2)), corpus, prune_min_postings=0)
    ctx = FunctionContext(s)

    def scalar(src):
        return spark.range(1).select(compile_function(src, ctx).alias("v")).collect()[0]["v"]

    assert scalar("maxdoc()") == 3 and scalar("numdocs()") == 3
    s.delete_by_query(TermQuery("gamma"))
    # maxDoc keeps counting deleted docs until merge reclaims them
    assert scalar("maxdoc()") == 3 and scalar("numdocs()") == 1


def test_search_after_pagination(searcher):
    hot = _hot(searcher)
    full = searcher.search(TermQuery(hot), 30).collect()
    p1 = searcher.search(TermQuery(hot), 10).collect()
    p2 = searcher.search_after(TermQuery(hot), 10, after=(p1[-1][1], p1[-1][0])).collect()
    p3 = searcher.search_after(TermQuery(hot), 10, after=(p2[-1][1], p2[-1][0])).collect()
    assert p1 + p2 + p3 == full
    # after=None degrades to plain search
    assert searcher.search_after(TermQuery(hot), 10).collect() == p1
