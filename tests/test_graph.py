"""Graph streams parity: shortest_path vs a brute-force BFS path enumerator,
gather_nodes vs hand aggregation — including cycles, multi-parent shortest
paths, and the no-path case (ShortestPathStream / GatherNodesStream)."""

from collections import deque

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.graph import gather_nodes, score_nodes, shortest_path

EDGES = [
    # diamond with two shortest paths a->z, a longer detour, and a cycle
    ("a", "b"), ("a", "c"), ("b", "z"), ("c", "z"),
    ("a", "d"), ("d", "e"), ("e", "z"),
    ("b", "a"),  # back-edge (cycle)
    ("z", "q"),  # edge out of the target
    ("c", "c2"), ("c2", "b"),  # longer route into b — must not extend paths
]


def brute_shortest(edges, src, dst, max_depth):
    """All shortest simple paths by plain BFS parent-DAG enumeration."""
    adj = {}
    for f, t in edges:
        adj.setdefault(f, []).append(t)
    dist = {src: 0}
    parents: dict = {}
    frontier = [src]
    d = 0
    while frontier and d < max_depth and dst not in dist:
        nxt = set()
        d += 1
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    nxt.add(v)
                    parents.setdefault(v, set()).add(u)
        for v in nxt:
            dist[v] = d
        frontier = sorted(nxt)
    if dst not in dist:
        return set()
    out = set()

    def walk(node, suffix):
        if node == src:
            out.add(tuple([src] + suffix))
            return
        for p in parents[node]:
            walk(p, [node] + suffix)

    walk(dst, [])
    return out


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_shortest_path_enumerates_all(spark, edges_df):
    got = shortest_path(edges_df, "a", "z", "src", "dst", max_depth=5).collect()
    exp = brute_shortest(EDGES, "a", "z", 5)
    assert {tuple(r["path"]) for r in got} == exp == {("a", "b", "z"), ("a", "c", "z")}
    assert all(r["depth"] == 2 for r in got)


def test_shortest_path_deeper_and_no_path(spark, edges_df):
    got = shortest_path(edges_df, "d", "q", "src", "dst", max_depth=5).collect()
    assert {tuple(r["path"]) for r in got} == brute_shortest(EDGES, "d", "q", 5) == {
        ("d", "e", "z", "q")
    }
    # unreachable within max_depth → empty (the "No path found" tuple)
    assert shortest_path(edges_df, "q", "a", "src", "dst", max_depth=4).count() == 0
    # depth cap respected
    assert shortest_path(edges_df, "d", "q", "src", "dst", max_depth=2).count() == 0


def test_shortest_path_cycle_does_not_loop(spark):
    ring = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
    )
    got = shortest_path(ring, "a", "c", "src", "dst", max_depth=6).collect()
    assert {tuple(r["path"]) for r in got} == {("a", "b", "c")}


def test_gather_nodes_metrics_ancestors_visited(spark):
    edges = spark.createDataFrame(
        [("o1", "p1", 3), ("o1", "p2", 5), ("o2", "p1", 7), ("o3", "p3", 1)],
        "src string, dst string, qty int",
    )
    roots = spark.createDataFrame([("o1",), ("o2",)], "node string")
    got = gather_nodes(
        edges,
        roots,
        "src",
        "dst",
        metrics={"cnt": F.count(F.lit(1)), "qty": F.sum("qty")},
        track_ancestors=True,
    ).collect()
    rows = {r["node"]: r for r in got}
    assert set(rows) == {"p1", "p2"}  # p3's root not gathered from
    assert rows["p1"]["cnt"] == 2 and rows["p1"]["qty"] == 10
    assert rows["p1"]["ancestors"] == ["o1", "o2"]
    assert rows["p2"]["cnt"] == 1 and rows["p2"]["ancestors"] == ["o1"]
    assert all(r["level"] == 1 for r in got)

    seen = spark.createDataFrame([("p1",)], "node string")
    got2 = gather_nodes(edges, roots, "src", "dst", visited=seen).collect()
    assert {r["node"] for r in got2} == {"p2"}


def test_score_nodes_tfidf_float32(spark):
    import math

    import numpy as np

    edges = spark.createDataFrame(
        [("o1", "p1"), ("o1", "p2"), ("o2", "p1"), ("o3", "p1"), ("o4", "p3")],
        "src string, dst string",
    )
    roots = spark.createDataFrame([("o1",), ("o2",)], "node string")
    nodes = gather_nodes(edges, roots, "src", "dst", metrics={"cnt": F.count(F.lit(1))})
    got = {r["node"]: r for r in score_nodes(nodes, edges, "dst", "cnt").collect()}
    n_docs = 5
    exp_df = {"p1": 3, "p2": 1}
    exp_tf = {"p1": 2, "p2": 1}
    f32 = np.float32
    for node in ("p1", "p2"):
        e = f32(math.log(exp_tf[node]) + 1.0) * f32(
            math.log((n_docs + 1) / (exp_df[node] + 1.0)) + 1.0
        )
        assert got[node]["nodeScore"] == float(e), node
        assert got[node]["docFreq"] == exp_df[node] and got[node]["numDocs"] == n_docs


# ---------------------------------------------------------------- GraphQuery
def brute_graph_query(docs, root_pred, max_depth=-1, only_leaf=False,
                      return_root=True, hop_pred=None):
    """Reference semantics of GraphQuery.java: doc-set BFS with a resultBits
    cycle guard; docs are (frm, to) rows, to=None marks a leaf."""
    result = {i for i, d in enumerate(docs) if root_pred(d)}
    roots = set(result)
    frontier = set(result)
    # GraphQuery.java:188-232 convention: maxDepth=N = roots + N hop levels
    # (the loop breaks only AFTER collecting the currentDepth >= maxDepth level)
    hops = 0
    while frontier and (max_depth == -1 or hops < max_depth):
        edge_vals = {docs[i][1] for i in frontier if docs[i][1] is not None}
        new = {
            i
            for i, d in enumerate(docs)
            if d[0] in edge_vals and i not in result and (hop_pred is None or hop_pred(d))
        }
        result |= new
        frontier = new
        hops += 1
    if not return_root:
        result -= roots
    if only_leaf:
        result = {i for i in result if docs[i][1] is None}
    return sorted(docs[i] for i in result)


GQ_DOCS = [
    ("r1", "x"), ("r2", "y"),          # roots (frm starts with r)
    ("x", "y"), ("x", "z"), ("y", "r1"),  # cycle back into a root value
    ("z", None), ("w", "z"),           # leaf doc; unreachable doc
    ("y", "w2"), ("w2", None),         # second leaf branch
]


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(max_depth=1),
        dict(max_depth=2),
        dict(only_leaf_nodes=True),
        dict(return_root=False),
        dict(max_depth=3, return_root=False, only_leaf_nodes=True),
    ],
    ids=lambda kw: ",".join(f"{k}={v}" for k, v in kw.items()) or "fixpoint",
)
def test_graph_query_flags(spark, kw):
    from lucene_solr_spark.operators.graph import graph_query

    docs = spark.createDataFrame(GQ_DOCS, "frm string, t string")
    got = graph_query(docs, F.col("frm").startswith("r"), "frm", "t", **kw)
    want = brute_graph_query(
        GQ_DOCS,
        lambda d: d[0].startswith("r"),
        max_depth=kw.get("max_depth", -1),
        only_leaf=kw.get("only_leaf_nodes", False),
        return_root=kw.get("return_root", True),
    )
    assert sorted((r["frm"], r["t"]) for r in got.collect()) == want


def test_graph_query_depth_one_is_roots_plus_one_hop(spark):
    """Pins the reference depth convention explicitly (GraphQuery.java:188-232):
    maxDepth=1 must return the roots AND one hop level, not roots alone."""
    from lucene_solr_spark.operators.graph import graph_query

    docs = spark.createDataFrame(GQ_DOCS, "frm string, t string")
    got = sorted(
        (r["frm"], r["t"])
        for r in graph_query(
            docs, F.col("frm").startswith("r"), "frm", "t", max_depth=1
        ).collect()
    )
    # roots r1,r2 have edge values {x,y}; one hop matches frm in {x,y}
    assert got == sorted(
        [("r1", "x"), ("r2", "y"), ("x", "y"), ("x", "z"), ("y", "r1"), ("y", "w2")]
    )


def test_graph_query_traversal_filter(spark):
    """traversalFilter applies to hop matches only, never the roots."""
    from lucene_solr_spark.operators.graph import graph_query

    docs = spark.createDataFrame(GQ_DOCS, "frm string, t string")
    got = graph_query(
        docs,
        F.col("frm").startswith("r"),
        "frm",
        "t",
        traversal_filter=F.col("frm") != "y",
    )
    want = brute_graph_query(
        GQ_DOCS, lambda d: d[0].startswith("r"), hop_pred=lambda d: d[0] != "y"
    )
    assert sorted((r["frm"], r["t"]) for r in got.collect()) == want


def test_high_freq_terms_order(searcher, oracle):
    """HighFreqTerms: df and ttf comparators, (freq desc, term desc)."""
    import pandas as pd

    got_df = searcher.high_freq_terms(15, order="df").toPandas()
    got_ttf = searcher.high_freq_terms(15, order="ttf").toPandas()
    stats = {t: (len(pl), sum(pl.values())) for t, pl in oracle.postings.items()}
    by_df = sorted(stats.items(), key=lambda kv: (-kv[1][0], [-ord(c) for c in kv[0]]))[:15]
    by_ttf = sorted(stats.items(), key=lambda kv: (-kv[1][1], [-ord(c) for c in kv[0]]))[:15]
    assert [(r.term, r.df, r.ttf) for r in got_df.itertuples()] == [
        (t, d, f) for t, (d, f) in by_df
    ]
    assert [(r.term, r.df, r.ttf) for r in got_ttf.itertuples()] == [
        (t, d, f) for t, (d, f) in by_ttf
    ]
