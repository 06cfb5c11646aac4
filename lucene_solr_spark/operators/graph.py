"""Graph traversal streams — Solr's graph expressions re-expressed Spark-first.

Reference: ``solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/``:

- ``ShortestPathStream.java:292-402`` — level-synchronous breadth-first
  search: each iteration joins the frontier against the edge collection,
  prunes nodes already seen at ANY earlier level (``cycle()``, :485-493),
  records every parent of each newly-reached node, stops at the first level
  that reaches ``toNode``, then enumerates ALL shortest paths by walking the
  per-level parent maps backward (:377-402);
- ``GatherNodesStream.java:542-604`` + ``Node.java`` — one-hop node gather:
  join root tuples to the edge collection on ``walk``, emit each distinct
  gathered node with ``level``, optional ``ancestors`` (trackTraversal) and
  per-node aggregation metrics over the contributing edge tuples.

Spark-first shape: the edge "collection" is a DataFrame at any scale; one BFS
level = one equi-join of the (small) frontier against it, so the frontier is
broadcast and the only shuffle is the distinct/groupBy on newly-reached
nodes — the same shape as Solr's per-level distributed join, with Spark's
shuffle replacing the coordinator's HashSet.  Per-level parent maps stay
DataFrames; path enumeration joins them backward, so the (possibly
combinatorial) path set is materialized distributed, never on the driver.
At 10^12 edges the frontier/parent DataFrames are bounded by the reachable
set per level; ``localCheckpoint`` after each level cuts the growing lineage
exactly where Solr's materialized per-level HashMap does.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

# frontier/visited sets are broadcast-hinted only below this row count; a
# web-scale BFS frontier past it takes the id-keyed shuffle-join plan
# instead (AQE may still broadcast when runtime stats allow)
_BCAST_MAX_NODES = 1_000_000


def gather_nodes(
    edges: DataFrame,
    roots: DataFrame,
    walk_col: str,
    gather_col: str,
    metrics: Optional[dict] = None,
    track_ancestors: bool = False,
    visited: Optional[DataFrame] = None,
    level: int = 1,
) -> DataFrame:
    """GatherNodesStream analog.  ``roots`` must have a ``node`` column; the
    hop joins ``roots.node == edges[walk_col]`` and gathers distinct
    ``edges[gather_col]`` values.

    ``metrics`` maps output column name -> aggregation over the contributing
    edge rows (e.g. ``{"cnt": F.count(F.lit(1)), "total": F.sum("price")}``
    — GatherNodesStream's count(*)/sum()/min()/max()/avg() metrics).
    ``visited`` (a ``node``-column DataFrame) filters nodes already gathered
    at earlier levels, the Traversal.visited check.  Output: one row per
    gathered node ``(node, level[, ancestors][, *metrics])``.
    """
    hop = edges.join(
        F.broadcast(roots.select(F.col("node").alias("_root"))),
        F.col(walk_col) == F.col("_root"),
    )
    aggs = []
    if track_ancestors:
        aggs.append(F.sort_array(F.collect_set("_root")).alias("ancestors"))
    for name, agg in (metrics or {}).items():
        aggs.append(agg.alias(name))
    if not aggs:  # distinct gather, no metrics
        aggs.append(F.count(F.lit(1)).alias("_edges"))
    out = (
        hop.groupBy(F.col(gather_col).alias("node"))
        .agg(*aggs)
        .withColumn("level", F.lit(level))
    )
    if not (metrics or track_ancestors):
        out = out.drop("_edges")
    if visited is not None:
        out = out.join(
            F.broadcast(visited.select(F.col("node").alias("_seen"))),
            F.col("node") == F.col("_seen"),
            "left_anti",
        )
    return out


def score_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    to_col: str,
    cnt_col: str = "cnt",
    num_docs: Optional[int] = None,
) -> DataFrame:
    """ScoreNodesStream analog (``reference solr/solrj/.../io/stream/
    ScoreNodesStream.java:227-246``): tf-idf-style relevance for gathered
    nodes — ``nodeScore = f32(ln(termFreq) + 1) * f32(ln((numDocs + 1) /
    (docFreq + 1)) + 1)`` where ``termFreq`` is the node's gather count,
    ``docFreq`` its global frequency in the edge collection and ``numDocs``
    the edge-collection size.

    The docFreq aggregation semi-joins the edge table to the (small) node set
    BEFORE the groupBy, so the shuffle carries only matching edges — the
    analog of Solr's TermsComponent point lookups.
    """
    if num_docs is None:
        num_docs = edges.count()
    hits = edges.join(
        F.broadcast(nodes.select(F.col("node").alias("_n"))),
        F.col(to_col) == F.col("_n"),
        "left_semi",
    )
    dfreq = hits.groupBy(F.col(to_col).alias("node")).agg(F.count(F.lit(1)).alias("docFreq"))
    joined = nodes.join(F.broadcast(dfreq), "node", "left").fillna({"docFreq": 0})
    tfs = (F.log(F.col(cnt_col).cast("double")) + F.lit(1.0)).cast("float")
    idf = (
        F.log((F.lit(float(num_docs) + 1.0)) / (F.col("docFreq").cast("double") + F.lit(1.0)))
        + F.lit(1.0)
    ).cast("float")
    return joined.withColumn("nodeScore", (tfs * idf).cast("float")).withColumn(
        "numDocs", F.lit(int(num_docs))
    )


def shortest_path(
    edges: DataFrame,
    from_node: str,
    to_node: str,
    from_col: str,
    to_col: str,
    max_depth: int = 4,
) -> DataFrame:
    """ShortestPathStream analog: all shortest paths from ``from_node`` to
    ``to_node`` over the directed edge DataFrame, as
    ``(path array<string>, depth int)`` — empty DataFrame when no path exists
    within ``max_depth`` (the reference's "No path found" tuple).
    """
    spark = edges.sparkSession
    edges = edges.select(
        F.col(from_col).cast("string").alias("src"), F.col(to_col).cast("string").alias("dst")
    )

    frontier = spark.createDataFrame([(from_node,)], "node string")
    visited = frontier  # cycle(): every earlier level blocks re-expansion
    parent_levels: list[DataFrame] = []
    found = False
    # frontier/visited sizes are known for free from each level's probe;
    # only hint a broadcast while they are genuinely broadcast-sized — on a
    # high-fanout web-scale graph a frontier can reach tens of millions of
    # nodes, where the hint would OOM the driver and an id-keyed shuffle
    # join is the correct plan (AQE still broadcasts if stats allow)
    frontier_n = visited_n = 1
    for _depth in range(max_depth):
        f_side = F.broadcast(frontier) if frontier_n <= _BCAST_MAX_NODES else frontier
        hop = (
            edges.join(f_side, edges.src == F.col("node"))
            .select(F.col("src").alias("parent"), F.col("dst").alias("child"))
            .distinct()
        )
        # ShortestPathStream:338-364 — target edges are kept even though the
        # cycle check would normally apply only to non-target nodes (the
        # target cannot be in `visited`: the loop stops the level it appears)
        v = visited.select(F.col("node").alias("_v"))
        v_side = F.broadcast(v) if visited_n <= _BCAST_MAX_NODES else v
        new = hop.join(
            v_side,
            hop.child == F.col("_v"),
            "left_anti",
        ).localCheckpoint(eager=True)
        parent_levels.append(new)
        frontier = new.select(F.col("child").alias("node")).distinct().localCheckpoint(eager=True)
        # one tiny driver aggregation answers both "reached target?" and
        # "frontier exhausted?" — one job per level, not three
        probe = frontier.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.col("node") == to_node).alias("hit")
        ).first()
        if probe["hit"]:
            found = True
            break
        if probe["n"] == 0:
            break
        # plain union: every constituent is already checkpointed, so lineage
        # stays O(depth) unions deep — no extra eager job per level
        visited = visited.unionByName(frontier)
        frontier_n = probe["n"]
        visited_n += frontier_n

    if not found:
        return spark.createDataFrame([], "path array<string>, depth int")

    # enumerate all shortest paths by walking the parent maps backward
    # (ShortestPathStream.java:377-402), distributed: one join per level
    paths = (
        parent_levels[-1]
        .where(F.col("child") == to_node)
        .select(F.array(F.col("parent"), F.col("child")).alias("path"))
    )
    for lvl in range(len(parent_levels) - 2, -1, -1):
        pl = parent_levels[lvl].select(
            F.col("parent").alias("_p"), F.col("child").alias("_c")
        )
        paths = paths.join(pl, paths["path"][0] == F.col("_c")).select(
            F.concat(F.array(F.col("_p")), F.col("path")).alias("path")
        )
    return paths.select("path", F.lit(len(parent_levels)).cast("int").alias("depth"))


def graph_query(
    docs: DataFrame,
    root_filter,
    from_col: str,
    to_col: str,
    max_depth: int = -1,
    only_leaf_nodes: bool = False,
    return_root: bool = True,
    traversal_filter=None,
) -> DataFrame:
    """Solr GraphQuery / ``{!graph}`` analog (``reference solr/core/src/java/
    org/apache/solr/search/join/GraphQuery.java:56-260``): start from the
    documents matching ``root_filter`` (depth 1), collect their ``to_col``
    edge values, match the documents whose ``from_col`` carries one of them
    (optionally AND ``traversal_filter``, GraphQuery.java:105-109), and repeat
    to fixpoint or ``max_depth`` levels (-1 = unbounded, :369).  Flags follow
    the reference: ``only_leaf_nodes`` keeps only documents with no edge value
    (NULL ``to_col``, the DocValuesFieldExistsQuery complement, :247-251);
    ``return_root=False`` drops the depth-1 documents.

    Spark-first shape: one BFS level = one semi-join of the corpus against the
    (small, distinct) frontier-value set; the reference's per-segment
    ``resultBits``/``GraphTermsCollector`` cycle guard becomes a value-level
    anti-join against the already-probed frontier values — equivalent because
    frontier matching is by ``from_col`` value, so re-probing a value can
    never add new documents.  Each level localCheckpoints the (tiny) value
    frontier; document rows are only unioned lazily and deduplicated once at
    the end, so the corpus is scanned once per level with the frontier
    broadcast — no full-corpus shuffle at any level.
    """
    spark = docs.sparkSession
    roots = docs.where(root_filter)
    matched = [roots]

    # values probed at any earlier level (the resultBits analog)
    visited = spark.createDataFrame([], "val string")
    frontier = (
        roots.where(F.col(to_col).isNotNull())
        .select(F.col(to_col).cast("string").alias("val"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Depth convention matches the reference (GraphQuery.java:188-232):
    # currentDepth=0 collects the roots, then the loop breaks only AFTER
    # collecting the level where currentDepth >= maxDepth — so maxDepth=N
    # returns the roots plus N hop levels.  Here ``hops`` counts completed
    # hop levels, so we keep hopping while hops < max_depth.
    hops = 0
    while max_depth == -1 or hops < max_depth:
        # one capped count answers both "frontier empty?" and "still
        # broadcast-sized?" — never a full count of a huge frontier
        f_n = frontier.limit(_BCAST_MAX_NODES + 1).count()
        if f_n == 0:
            break
        f = frontier.select(F.col("val").alias("_f"))
        f_side = F.broadcast(f) if f_n <= _BCAST_MAX_NODES else f
        hop = docs.join(
            f_side,
            F.col(from_col).cast("string") == F.col("_f"),
            "left_semi",
        )
        if traversal_filter is not None:
            hop = hop.where(traversal_filter)
        matched.append(hop)
        # plain union: every constituent is already checkpointed, so lineage
        # stays O(depth) unions deep — no extra eager job per level
        visited = visited.unionByName(frontier)
        frontier = (
            hop.where(F.col(to_col).isNotNull())
            .select(F.col(to_col).cast("string").alias("val"))
            .distinct()
            .join(visited.select(F.col("val").alias("_v")), F.col("val") == F.col("_v"), "left_anti")
            .select("val")
            .localCheckpoint(eager=True)
        )
        hops += 1

    out = matched[0]
    for m in matched[1:]:
        out = out.unionByName(m)
    out = out.distinct()
    if not return_root:
        # the reference clears the root docs from the final bitset even when a
        # hop re-matched them (GraphQuery returnRoot=false)
        out = out.subtract(roots)
    if only_leaf_nodes:
        out = out.where(F.col(to_col).isNull())
    return out
