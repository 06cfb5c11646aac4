"""QualityBenchmark analog: per-topic precision/recall/AvP/MRR semantics,
including the reference's quirks (pAt[n] = 0 for short result lists, MRR
only within the top 5)."""

import pytest

from lucene_solr_spark.operators.quality import quality_stats, quality_summary


@pytest.fixture(scope="module")
def judged(spark):
    # topic A: 10 hits, relevant at ranks 1, 3, 10; 4 relevant exist
    # topic B: only 7 hits, relevant at rank 6; 2 relevant exist
    # topic C: 10 hits, none relevant; 1 relevant exists
    results = spark.createDataFrame(
        [("A", r, 100 + r) for r in range(1, 11)]
        + [("B", r, 200 + r) for r in range(1, 8)]
        + [("C", r, 300 + r) for r in range(1, 11)],
        "topic string, rank int, doc_id long",
    )
    judgments = spark.createDataFrame(
        [("A", 101), ("A", 103), ("A", 110), ("A", 999),
         ("B", 206), ("B", 998),
         ("C", 997)],
        "topic string, doc_id long",
    )
    return results, judgments


def test_quality_stats_hand_computed(spark, judged):
    results, judgments = judged
    got = {r["topic"]: r.asDict() for r in quality_stats(results, judgments, k=10).collect()}

    a = got["A"]
    assert (a["max_good"], a["num_good"], a["n_results"]) == (4, 3, 10)
    assert a["precision_at_10"] == pytest.approx(3 / 10)
    assert a["recall"] == pytest.approx(3 / 4)
    # AvP = (1/1 + 2/3 + 3/10) / 4  (QualityStats.getAvp)
    assert a["avp"] == pytest.approx((1 / 1 + 2 / 3 + 3 / 10) / 4)
    assert a["mrr"] == pytest.approx(1.0)
    assert a["first_rel_rank"] == 1

    b = got["B"]
    # only 7 hits: pAt[10] never filled -> 0 (QualityStats.java:96-98)
    assert b["precision_at_10"] == 0.0
    assert b["recall"] == pytest.approx(1 / 2)
    assert b["avp"] == pytest.approx((1 / 6) / 2)
    # first relevant at rank 6 > 5 -> mrr stays 0 (QualityStats.java:86-89)
    assert b["mrr"] == 0.0
    assert b["first_rel_rank"] == 6

    c = got["C"]
    assert c["num_good"] == 0 and c["recall"] == 0.0 and c["avp"] == 0.0
    assert c["mrr"] == 0.0 and c["first_rel_rank"] == 0


def test_quality_summary(spark, judged):
    results, judgments = judged
    stats = quality_stats(results, judgments, k=10)
    row = quality_summary(stats, k=10).collect()[0]
    assert row["n_topics"] == 3
    expected_map = ((1 + 2 / 3 + 3 / 10) / 4 + (1 / 6) / 2 + 0.0) / 3
    assert row["map"] == pytest.approx(expected_map)
    assert row["mean_precision_at_10"] == pytest.approx((0.3 + 0.0 + 0.0) / 3)
