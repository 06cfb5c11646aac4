"""Search-result clustering — the Solr clustering component's role
(``reference solr/contrib/clustering/src/java/org/apache/solr/handler/
clustering/ClusteringComponent.java:63`` — cluster the documents of ONE
result page at query time, never the corpus).

Re-expressed numerically so the DuckDB oracle can replay it bit-for-bit:
each hit becomes a bag-of-tokens vector under a fixed hashed vocabulary
(poly31 token hash into ``n_buckets`` buckets — the component's TF vector
with hashing-trick dimensionality), clustered by the engine's deterministic
integer k-means (:func:`~lucene_solr_spark.operators.similarity.
kmeans_centroids` — hash-spread init + exact-L2 Lloyd rounds).  The
reference ships Lingo/STC as label-heuristic engines and documents k-means
(bisecting variant) as the pluggable alternative; labels here are the
cluster's dominant buckets rather than extracted phrases.

Scale shape: everything after the search is k-row work — ``n`` hits ×
``n_buckets`` feature cells — exactly like the reference component, which
clusters a result page on one node.  The only corpus-scale stage is the
search itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import P_MOD


def _bucket(col: str, n_buckets: int):
    """poly31 string hash mod ``n_buckets`` — identical to the DSIR feature
    hash (sampling.py) and the oracle's list_reduce replay."""
    return (
        F.expr(
            f"aggregate(transform(sequence(1, length({col})), i -> cast(ascii(substring({col}, i, 1)) as bigint)),"
            f" cast(0 as bigint), (a, c) -> (a * 31 + c) % {P_MOD})"
        )
        % F.lit(int(n_buckets))
    )


def cluster_results(
    searcher,
    query,
    n: int = 60,
    k: int = 4,
    n_buckets: int = 32,
    n_rounds: int = 2,
) -> DataFrame:
    """Cluster the top-``n`` hits of ``query`` into ``k`` groups →
    ``(doc_id, cluster)`` with ``cluster`` = trained centroid id (ties and
    init deterministic, so the assignment is replayable in ANSI SQL)."""
    from .similarity import _assign_nearest, kmeans_centroids

    spark = searcher.spark
    top = searcher.search(query, n)
    hits = searcher.fetch(top, columns=["text"]).select(
        F.col(searcher.index.config.id_col).cast("long").alias("doc_id"), "text"
    )

    toks = hits.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("_f"),
    )
    counts = (
        toks.select("doc_id", _bucket("_f", n_buckets).alias("_b"))
        .groupBy("doc_id", "_b")
        .agg(F.count("*").alias("_c"))
    )
    # dense n_buckets-vector per hit (missing buckets are explicit zeros so
    # every vector has the same dimension for the L2 assignment)
    grid = hits.select("doc_id").crossJoin(
        spark.range(int(n_buckets)).select(F.col("id").alias("_b"))
    )
    vecs = (
        grid.join(counts, ["doc_id", "_b"], "left")
        .select("doc_id", "_b", F.coalesce(F.col("_c"), F.lit(0)).alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_b", "_c"))), lambda x: x["_c"]
            ).alias("qvec")
        )
        .select(F.col("doc_id").alias("vec_id"), "qvec")
    )
    cents = kmeans_centroids(vecs, k, n_rounds)
    assigned = _assign_nearest(vecs, cents)
    return assigned.select(
        F.col("vec_id").cast("long").alias("doc_id"),
        F.col("cent_id").cast("long").alias("cluster"),
    )
