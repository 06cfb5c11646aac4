"""IR-quality benchmark: per-topic precision/recall/MAP/MRR over judged runs.

Re-expression of the reference's quality harness
(``reference lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityBenchmark.java:87-130`` and ``QualityStats.java:80-140``): each topic's
ranked hits are judged against a relevance set and folded into

- ``precision@n`` = |relevant in first n| / n, recorded only when an n-th hit
  exists (``QualityStats.addResult`` fills ``pAt[n]`` per retrieved rank;
  unfilled points stay 0 — short result lists yield P@n = 0, mirrored here);
- ``recall`` = |relevant retrieved| / maxGoodPoints (``:99``);
- ``avp`` = Σ over relevant ranks r of (|relevant ≤ r| / r), divided by
  maxGoodPoints (``getAvp``, ``:121-123``) — the MAP summand;
- ``mrr`` = 1/rank of the first relevant hit, but only when that rank ≤ 5
  (``:86-89`` — the reference's top-5 reciprocal-rank quirk, kept).

Spark-first: the run table is tiny (k rows per topic), so everything is one
left join against the judgment set plus a per-topic rank-ordered running sum
— the only shuffles key on ``topic`` and carry k·topics rows, independent of
corpus size.  At 10^12 docs the judged run is still thousands of rows; the
corpus never enters this job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["judged_results", "quality_stats", "quality_summary"]


def judged_results(results: DataFrame, judgments: DataFrame) -> DataFrame:
    """Join a run with its judgments and accumulate relevance down the ranking.

    ``results``: (topic, rank, doc_id) with rank 1-based and dense per topic;
    ``judgments``: (topic, doc_id) relevant pairs (the Judge).  Returns the
    run rows with ``rel`` (0/1) and ``cum_good`` (relevant hits at or above
    this rank — ``QualityStats.numGoodPoints`` after ``addResult(rank)``).
    """
    rel = judgments.select("topic", "doc_id").distinct().withColumn("rel", F.lit(1))
    out = results.join(rel, ["topic", "doc_id"], "left").fillna(0, subset=["rel"])
    w = Window.partitionBy("topic").orderBy("rank")
    return out.withColumn("cum_good", F.sum("rel").over(w))


def quality_stats(results: DataFrame, judgments: DataFrame, k: int = 10) -> DataFrame:
    """Per-topic QualityStats: (topic, max_good, num_good, n_results,
    precision_at_k, recall, avp, mrr)."""
    j = judged_results(results, judgments)
    per_topic = j.groupBy("topic").agg(
        F.max(F.when(F.col("rank") == k, F.col("cum_good"))).alias("good_at_k"),
        F.max("cum_good").cast("long").alias("num_good"),
        F.max("rank").cast("long").alias("n_results"),
        F.sum(F.when(F.col("rel") == 1, F.col("cum_good").cast("double") / F.col("rank"))).alias(
            "p_rel_sum"
        ),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel_rank"),
    )
    max_good = judgments.select("topic", "doc_id").distinct().groupBy("topic").agg(
        F.count("*").cast("long").alias("max_good")
    )
    out = per_topic.join(max_good, "topic", "left").fillna(0, subset=["max_good"])
    return out.select(
        "topic",
        "max_good",
        "num_good",
        "n_results",
        # pAt[k] stays 0 unless a k-th hit was added (QualityStats.java:96-98)
        F.coalesce(F.col("good_at_k").cast("double") / F.lit(float(k)), F.lit(0.0)).alias(
            f"precision_at_{k}"
        ),
        F.when(F.col("max_good") > 0, F.col("num_good").cast("double") / F.col("max_good"))
        .otherwise(F.lit(0.0))
        .alias("recall"),
        # getAvp: pReleventSum / maxGoodPoints, 0 when no judgments (:121-123)
        F.when(F.col("max_good") > 0, F.coalesce(F.col("p_rel_sum"), F.lit(0.0)) / F.col("max_good"))
        .otherwise(F.lit(0.0))
        .alias("avp"),
        # mrr only when the first relevant hit lands in the top 5 (:86-89)
        F.when(F.col("first_rel_rank") <= 5, F.lit(1.0) / F.col("first_rel_rank"))
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        F.coalesce(F.col("first_rel_rank"), F.lit(0)).cast("int").alias("first_rel_rank"),
    )


def quality_summary(stats: DataFrame, k: int = 10) -> DataFrame:
    """The benchmark's aggregate row (``QualityStats.average``): arithmetic
    means across topics — MAP is avg(avp)."""
    return stats.agg(
        F.count("*").cast("long").alias("n_topics"),
        F.avg(f"precision_at_{k}").alias(f"mean_precision_at_{k}"),
        F.avg("recall").alias("mean_recall"),
        F.avg("avp").alias("map"),
        F.avg("mrr").alias("mean_mrr"),
    )
