"""classification/utils analogs: ConfusionMatrixGenerator, DatasetSplitter,
the kNN quantized contract vote, and the deterministic training-shard export.
"""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.operators.classify import (
    KNearestNeighborClassifier,
    SimpleNaiveBayesClassifier,
    classification_metrics,
    confusion_matrix,
    split_dataset,
)
from lucene_solr_spark.operators.sampling import K, P, shard_assign


@pytest.fixture(scope="module")
def nb_assigned(index8, spark_corpus):
    nb = SimpleNaiveBayesClassifier(index8, spark_corpus, "role")
    return nb.classify().persist()


def test_confusion_matrix_counts(nb_assigned, spark_corpus):
    cm = confusion_matrix(nb_assigned, spark_corpus, "role").toPandas()
    # brute: pandas crosstab of the same argmax output
    got = nb_assigned.select("doc_id", "cls").toPandas()
    actual = spark_corpus.select("doc_id", "role").toPandas()
    merged = got.merge(actual, on="doc_id")
    brute = (
        merged.groupby(["role", "cls"]).size().reset_index(name="n")
    )
    lhs = {(r.role, r.cls): r.n for r in brute.itertuples()}
    rhs = {(r.actual, r.assigned): r.n for r in cm.itertuples()}
    assert lhs == rhs
    assert cm["n"].sum() == spark_corpus.count()


def test_classification_metrics(nb_assigned, spark_corpus):
    cm = confusion_matrix(nb_assigned, spark_corpus, "role").collect()
    m = classification_metrics(cm)
    assert m["total"] == spark_corpus.count()
    assert 0.0 <= m["accuracy"] <= 1.0
    # accuracy equals the diagonal mass by definition
    diag = sum(int(r["n"]) for r in cm if r["actual"] == r["assigned"])
    assert m["accuracy"] == diag / m["total"]
    for stats in m["per_class"].values():
        for v in stats.values():
            assert 0.0 <= v <= 1.0


def test_split_dataset_deterministic_and_banded(spark_corpus):
    s1 = split_dataset(spark_corpus, test_ppm=200_000, cv_ppm=100_000)
    s2 = split_dataset(spark_corpus.repartition(13), test_ppm=200_000, cv_ppm=100_000)
    p1 = s1.select("doc_id", "split").toPandas().sort_values("doc_id").reset_index(drop=True)
    p2 = s2.select("doc_id", "split").toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)
    # every row lands in exactly one band, and the band matches the hash replay
    for r in p1.itertuples():
        band = ((r.doc_id % P) * K) % P % 1_000_000
        want = "test" if band < 200_000 else ("cv" if band < 300_000 else "train")
        assert r.split == want


def test_split_dataset_validation(spark_corpus):
    with pytest.raises(ValueError):
        split_dataset(spark_corpus, test_ppm=600_000, cv_ppm=500_000)
    with pytest.raises(ValueError):
        split_dataset(spark_corpus, test_ppm=-1)


def test_knn_quantized_matches_float_argmax(searcher):
    knn = KNearestNeighborClassifier(searcher, "role")
    for d in (3, 17, 40):
        f = knn.classify_doc(d)
        q = knn.classify_doc_quantized(d)
        assert (f is None) == (q is None)
        if f is not None:
            assert f[0] == q[0]
            assert isinstance(q[1], int)


def test_shard_assign_brute_and_invariance(spark_corpus):
    out = shard_assign(spark_corpus.select("doc_id"), 7, n_partitions=8).toPandas()
    # brute replay: rank in (hash, id) order, floor-divided into shards
    ids = sorted(out["doc_id"], key=lambda i: (((i % P) * K) % P, i))
    want = {i: (rk // 7, rk % 7) for rk, i in enumerate(ids)}
    for r in out.itertuples():
        assert want[r.doc_id] == (r.shard_id, r.shard_pos)
    # exact shard sizes: all full except possibly the last
    sizes = out.groupby("shard_id").size()
    assert (sizes.iloc[:-1] == 7).all() if len(sizes) > 1 else True
    assert sizes.sum() == len(out)
    # partitioning invariance
    out2 = shard_assign(
        spark_corpus.select("doc_id").repartition(3), 7, n_partitions=5
    ).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_shard_assign_validation(spark_corpus):
    with pytest.raises(ValueError):
        shard_assign(spark_corpus, 0)
