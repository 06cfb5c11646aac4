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
