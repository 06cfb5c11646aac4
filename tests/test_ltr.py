"""LTR contrib parity: features, float32 model arithmetic, rescorer order.

Brute-force float32 replication in numpy of reference
``solr/contrib/ltr`` LinearModel / MultipleAdditiveTreesModel semantics.
"""

import numpy as np
import pytest

from lucene_solr_spark.operators.ltr import (
    FieldLengthFeature,
    FieldValueFeature,
    IdentityNormalizer,
    LinearModel,
    MinMaxNormalizer,
    MultipleAdditiveTreesModel,
    OriginalScoreFeature,
    QueryFeature,
    StandardNormalizer,
    TreeNode,
    ValueFeature,
    ltr_rescore,
)
from lucene_solr_spark.functions.smallfloat import byte4_to_int, int_to_byte4
from lucene_solr_spark.plans.query import TermQuery


def _first_pass(searcher, term="vecodu", k=30):
    return searcher.search(TermQuery(term), k=k, prune=False)


def test_linear_model_float32_exact(searcher):
    top = _first_pass(searcher)
    f_orig = OriginalScoreFeature("orig", MinMaxNormalizer(0.0, 4.0))
    f_turn = FieldValueFeature("turn", StandardNormalizer(10.0, 5.0), field="turn_idx")
    f_const = ValueFeature("c", IdentityNormalizer(), value=0.25)
    model = LinearModel(
        features=(f_orig, f_turn, f_const),
        weights={"orig": 0.7, "turn": 0.2, "c": 0.1},
    )
    got = ltr_rescore(searcher, top, model).toPandas()

    base = {r["doc_id"]: r for r in top.df.collect()}
    turn = {
        r["doc_id"]: r["turn_idx"]
        for r in searcher.corpus.select("doc_id", "turn_idx").collect()
    }
    f32 = np.float32
    exp = {}
    for d, r in base.items():
        n1 = f32(f32(f32(r["score"]) - f32(0.0)) / f32(4.0))
        n2 = f32(f32(f32(turn[d]) - f32(10.0)) / f32(5.0))
        n3 = f32(0.25)
        s = f32(n1 * f32(0.7))
        s = f32(s + f32(n2 * f32(0.2)))
        s = f32(s + f32(n3 * f32(0.1)))
        exp[d] = float(s)

    assert len(got) == len(base)
    for _, row in got.iterrows():
        assert row["score"] == pytest.approx(exp[row["doc_id"]], abs=0.0), row["doc_id"]
    # rescorer order: (model score desc, doc_id asc) — LTRRescorer.java:124-138
    order = list(zip(got["score"], got["doc_id"]))
    assert order == sorted(order, key=lambda t: (-t[0], t[1]))


def test_trees_model_routing_and_slack(searcher):
    top = _first_pass(searcher, k=20)
    f_orig = OriginalScoreFeature("orig")
    f_turn = FieldValueFeature("turn", field="turn_idx")
    turn = {
        r["doc_id"]: r["turn_idx"]
        for r in searcher.corpus.select("doc_id", "turn_idx").collect()
    }
    # threshold equal to an actual feature value routes LEFT thanks to the
    # +1E-6f slack (MultipleAdditiveTreesModel.java:124,150-156) — pick the
    # boundary from the candidate set so the slack path is really exercised
    cand_ids = [r["doc_id"] for r in top.df.collect()]
    boundary = float(sorted(turn[d] for d in cand_ids)[len(cand_ids) // 2])
    t1 = TreeNode.split(
        "turn", boundary,
        left=TreeNode.split("orig", 1.0, left=TreeNode.leaf(0.1), right=TreeNode.leaf(0.4)),
        right=TreeNode.leaf(0.8),
    )
    t2 = TreeNode.split("orig", 2.0, left=TreeNode.leaf(0.3), right=TreeNode.leaf(0.9))
    model = MultipleAdditiveTreesModel(features=(f_orig, f_turn), trees=((1.0, t1), (0.5, t2)))
    got = ltr_rescore(searcher, top, model).toPandas()

    base = {r["doc_id"]: r["score"] for r in top.df.collect()}
    f32 = np.float32

    def tree(node, fv):
        if node.left is None:
            return f32(node.value)
        nxt = node.left if fv[node.feature] <= f32(node.threshold) else node.right
        return tree(nxt, fv)

    for _, row in got.iterrows():
        d = row["doc_id"]
        fv = {"orig": f32(base[d]), "turn": f32(turn[d])}
        s = f32(f32(1.0) * tree(t1, fv))
        s = f32(s + f32(f32(0.5) * tree(t2, fv)))
        assert row["score"] == pytest.approx(float(s), abs=0.0), d
    # at least one doc sits exactly on the boundary, so the slack matters
    assert any(turn[d] == boundary for d in base)


def test_field_length_feature_is_byte4_roundtrip(searcher, oracle):
    top = _first_pass(searcher, k=15)
    model = LinearModel(
        features=(FieldLengthFeature("len"),), weights={"len": 1.0}
    )
    got = ltr_rescore(searcher, top, model).toPandas()
    for _, row in got.iterrows():
        dec = int(byte4_to_int(np.int64(oracle.norm[int(row["doc_id"])])))
        assert row["score"] == np.float32(dec) * np.float32(1.0), row["doc_id"]


def test_query_feature_default_on_miss(searcher):
    top = _first_pass(searcher, k=10)
    # a query over a term unlikely to co-occur in all candidates
    model = LinearModel(
        features=(
            OriginalScoreFeature("orig"),
            QueryFeature("q2", query=TermQuery("wuloze"), default=0.0),
        ),
        weights={"orig": 1.0, "q2": 1.0},
    )
    got = ltr_rescore(searcher, top, model).toPandas()
    base = {r["doc_id"]: r["score"] for r in top.df.collect()}
    q2 = {r["doc_id"]: r["score"] for r in searcher.search(TermQuery("wuloze"), k=10**6, prune=False).df.collect()}
    f32 = np.float32
    for _, row in got.iterrows():
        d = row["doc_id"]
        s = f32(f32(base[d]) * f32(1.0))
        s = f32(s + f32(f32(q2.get(d, 0.0)) * f32(1.0)))
        assert row["score"] == pytest.approx(float(s), abs=0.0), d
    assert any(d not in q2 for d in base), "need at least one miss to exercise the default"
