"""Scalable exact ranking (operators/ranks.py): identity with the naive
single-partition window, and a plan guard that the contract queries using it
no longer collapse to one partition (the reference's per-segment-sort +
OrdinalMap-offset shape, GlobalOrdinalsQuery.java / ExportWriter.java:72)."""
import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.operators.ranks import (
    global_dense_rank,
    global_row_number,
    nearest_rank_values,
)


@pytest.fixture(scope="module")
def values_df(spark):
    rng = np.random.default_rng(1234)
    vals = rng.integers(0, 500, size=20_000).tolist()
    return spark.createDataFrame([(int(v),) for v in vals], "v long").repartition(16)


def test_global_row_number_matches_naive(spark, values_df):
    fast = global_row_number(values_df, F.col("v").asc(), out="rn", num_partitions=8)
    # row_number tie order is arbitrary within equal keys in BOTH approaches;
    # the (v, sorted-rank-set) correspondence is the invariant
    got = sorted((r["v"], r["rn"]) for r in fast.collect())
    naive = values_df.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    want = sorted((r["v"], r["rn"]) for r in naive.collect())
    # per-value rank sets must be identical
    from collections import defaultdict

    g, w = defaultdict(set), defaultdict(set)
    for v, rn in got:
        g[v].add(rn)
    for v, rn in want:
        w[v].add(rn)
    assert g == w


def test_global_dense_rank_matches_naive(spark, values_df):
    fast = global_dense_rank(
        values_df, F.col("v").asc(), F.col("v"), out="ord", num_partitions=8
    )
    naive = values_df.withColumn("ord", F.dense_rank().over(Window.orderBy("v")))
    assert sorted(map(tuple, fast.select("v", "ord").collect())) == sorted(
        map(tuple, naive.select("v", "ord").collect())
    )


def test_global_row_number_desc_and_parallelism_invariance(spark, values_df):
    a = global_row_number(values_df, F.col("v").desc(), out="rn", num_partitions=3)
    b = global_row_number(values_df, F.col("v").desc(), out="rn", num_partitions=17)
    key = lambda df: sorted((r["v"], r["rn"]) for r in df.collect())
    from collections import defaultdict

    def by_val(pairs):
        d = defaultdict(set)
        for v, rn in pairs:
            d[v].add(rn)
        return d

    assert by_val(key(a)) == by_val(key(b))


def test_nearest_rank_values_exact(spark, values_df):
    pdf = values_df.toPandas()
    arr = np.sort(pdf["v"].to_numpy())
    n = len(arr)
    ranks = {"p25": max(1, int(n * 0.25)), "p50": max(1, int(n * 0.50)), "p95": max(1, int(n * 0.95))}
    row = nearest_rank_values(values_df, "v", ranks, num_partitions=8).collect()[0]
    for name, k in ranks.items():
        assert row[name] == int(arr[k - 1]), (name, row[name], int(arr[k - 1]))


def test_nearest_rank_single_row(spark):
    df = spark.createDataFrame([(42,)], "v long")
    row = nearest_rank_values(df, "v", {"p50": 1}, num_partitions=4).collect()[0]
    assert row["p50"] == 42


def test_percentile_contract_has_no_unpartitioned_window(spark, tmp_path):
    """The agg_percentiles / agg_stats_numeric contract queries must not plan a
    single-partition global window over lineitem."""
    from lucene_solr_spark.contract_pipeline import agg_queries

    sf = "/root/testdata/sf0.001"
    qs = agg_queries()
    for name in ("agg_percentiles", "agg_stats_numeric"):
        plan = qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "partitionBy" not in line:
                # executed plan prints Window [..], [ordering] — a global
                # window has no partition spec: "Window [...], [v ASC...]"
                # Partitioned windows print: "Window [...], [pid], [v ASC]"
                assert line.count("], [") >= 2, f"{name}: unpartitioned window: {line}"


def test_nearest_rank_partition_count_stays_tiny(spark, values_df):
    """Regression: the crossJoin of single-row rank branches must not
    multiply partition counts (was 32^4 tasks at local[32])."""
    out = nearest_rank_values(
        values_df, "v", {"a": 10, "b": 100, "c": 1000, "d": 10000}, num_partitions=8
    )
    assert out.rdd.getNumPartitions() <= 8


def test_percentile_contract_matches_oracle(spark):
    import duckdb
    import os

    from lucene_solr_spark.contract_pipeline import agg_queries
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    osql = e.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{os.path.join(sf, 'lineitem.parquet')}')"
    )
    qs = agg_queries()
    for name in ("agg_percentiles", "agg_stats_numeric"):
        got = qs[name](spark, sf).toPandas()
        want = con.execute(osql[name]).df()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        assert got.shape == want.shape
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (name, c)
