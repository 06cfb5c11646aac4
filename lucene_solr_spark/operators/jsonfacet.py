"""JSON Facet API interpreter: nested terms facets with stat sorting.

Reference: ``solr/core/src/java/org/apache/solr/search/facet/`` —
``FacetField``/``FacetFieldProcessorByHashDV`` (terms buckets, ``limit`` /
``sort`` by count, index order, or any sub-stat), ``FacetModule`` request
shape ``{type: terms, field: f, limit: n, sort: "stat desc", facet: {stat:
"avg(x)", sub: {...}}}``, and the agg registry (``SumAgg``/``AvgAgg``/
``MinMaxAgg``/``UniqueAgg``/``CountAgg``).

Spark-first: each nesting level is ONE groupBy over the ancestor-key prefix
(+ this level's field); bucket selection is a TakeOrderedAndProject at the
top level and a per-parent window ``row_number() <= limit`` below — the
distributed facet-merge + refinement machinery (``FacetFieldMerger``,
over-request/refine) is unnecessary because the shuffle computes exact
buckets.  No UDFs anywhere; everything stays in whole-stage codegen.

Bucket options follow ``FacetField.java`` (offset / mincount / prefix) and a
field-less spec is the root stats facet (``FacetModule``'s top-level
``{x:'sum(f)'}`` form: one row, domain count + stats).

Unsupported (documented): ``allBuckets``/``missing``/``numBuckets``, range
facets here (range facets are covered by agg_range_facet), ``percentile``
inside the json.facet spec (agg_percentiles covers it).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_STAT_RE = re.compile(r"^\s*(sum|avg|min|max|unique)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$")

_AGGS = {
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "unique": lambda c: F.countDistinct(c),
}


def _stat_col(name: str, src: str):
    m = _STAT_RE.match(src)
    if not m:
        raise ValueError(f"unsupported stat {src!r} (sum/avg/min/max/unique(field))")
    fn, field = m.group(1), m.group(2)
    return _AGGS[fn](F.col(field)).alias(name)


def _sort_exprs(sort: str, field: str, stat_names: set):
    """Solr sort spec: '<count|index|statname> <asc|desc>'; ties break by the
    bucket value ascending (index order), matching the hash-DV processor's
    deterministic resort."""
    part = (sort or "count desc").split()
    key, direction = part[0], (part[1] if len(part) > 1 else "desc")
    if key == "index":
        col = F.col(field)
    elif key == "count":
        col = F.col("count")
    elif key in stat_names:
        col = F.col(key)
    else:
        raise ValueError(f"sort references unknown stat {key!r}")
    primary = col.desc() if direction == "desc" else col.asc()
    return [primary, F.col(field).asc()]


def json_facet(df: DataFrame, spec: dict) -> DataFrame:
    """Evaluate one (possibly nested) terms facet spec; returns the flattened
    leaf-bucket rows carrying every ancestor bucket key and every level's
    stats (ancestor stats repeat per child row — the JSON tree, relational).

    ``spec`` = ``{"field": str, "limit": int, "offset": int, "mincount": int,
    "prefix": str, "sort": str, "stats": {name: "agg(field)"}, "facet":
    <child spec or None>}``.  A spec with no ``field`` is the root stats
    facet: ONE row with the domain's ``count`` plus each stat."""
    if spec.get("field") is None:
        stats = {k: v for k, v in (spec.get("stats") or {}).items()}
        return df.agg(
            F.count("*").cast("bigint").alias("count"),
            *[_stat_col(k, v) for k, v in stats.items()],
        )
    return _level(df, spec, parents=[], parent_stats=[])


def _level(df: DataFrame, spec: dict, parents: list, parent_stats: list) -> DataFrame:
    field = spec["field"]
    limit = int(spec.get("limit", 10))
    offset = int(spec.get("offset", 0))
    mincount = int(spec.get("mincount", 1))
    prefix = spec.get("prefix")
    stats = {k: v for k, v in (spec.get("stats") or {}).items()}
    keys = parents + [field]
    aggs = [F.count("*").cast("bigint").alias("count")] + [
        _stat_col(k, v) for k, v in stats.items()
    ]
    # docs missing the facet field form no bucket (Solr's `missing` bucket
    # is opt-in and unsupported here); `prefix` restricts the bucket domain
    # BEFORE counting (FacetFieldProcessor startTermIndex/endTermIndex)
    domain = df.filter(F.col(field).isNotNull())
    if prefix is not None:
        domain = domain.filter(F.col(field).cast("string").startswith(prefix))
    grouped = domain.groupBy(*keys).agg(*aggs)
    if mincount > 1:
        grouped = grouped.filter(F.col("count") >= mincount)
    order = _sort_exprs(spec.get("sort", "count desc"), field, set(stats))
    if parents:
        w = Window.partitionBy(*parents).orderBy(*order)
        kept = grouped.withColumn("__rn", F.row_number().over(w)).filter(
            (F.col("__rn") > offset) & (F.col("__rn") <= offset + limit)
        ).drop("__rn")
    elif offset > 0:
        kept = (
            grouped.withColumn("__rn", F.row_number().over(Window.orderBy(*order)))
            .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
            .drop("__rn")
        )
    else:
        kept = grouped.orderBy(*order).limit(limit)
    # prefix this level's output columns so nesting levels don't collide
    prefix = spec.get("name", field)
    renamed = kept
    for c in ["count", *stats]:
        renamed = renamed.withColumnRenamed(c, f"{prefix}_{c}")
    level_stats = [f"{prefix}_count"] + [f"{prefix}_{k}" for k in stats]

    child = spec.get("facet")
    if not child:
        return renamed.select(*keys, *parent_stats, *level_stats)
    # restrict the corpus to surviving buckets (broadcast semi-join: the
    # bucket list is ≤ parents×limit rows), then recurse one level down
    survivors = renamed.select(*keys, *level_stats)
    sub_df = df.join(F.broadcast(survivors.select(*keys)), keys, "left_semi")
    child_rows = _level(sub_df, child, parents=keys, parent_stats=[])
    return child_rows.join(F.broadcast(survivors), keys).select(
        *keys,
        *parent_stats,
        *level_stats,
        *[c for c in child_rows.columns if c not in keys],
    )
