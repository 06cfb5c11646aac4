"""Deterministic sampling operators for training-data pipelines.

No reference analog (task-brief surface); the sampling primitive reuses the
engine's partitioning-stable multiplicative id hash (the same deviation
documented on ``IndexSearcher.sampled_facet``): ``h = ((id % p) * K) % p``
with p = 100000007, K = 2654435761 — pure integer arithmetic, reproducible
under ANY partitioning and bit-exactly replayable in ANSI SQL, unlike
``DataFrame.sample`` whose Bernoulli draw depends on partition layout.

At 100 TB a sample is a pure Catalyst filter: no RNG state, no shuffle, and
predicate + column pruning still reach the scan underneath it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["sample_hash", "stratified_sample"]

P = 100000007
K = 2654435761


def sample_hash(id_col: Column) -> Column:
    """The deterministic per-row hash; < ~2.7e17 intermediate, no overflow."""
    return ((id_col % F.lit(P)) * F.lit(K)) % F.lit(P)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    id_col: str = "doc_id",
    default_rate: Optional[int] = None,
) -> DataFrame:
    """Keep 1-in-``rates[stratum]`` rows per stratum (integer rates >= 1;
    rate 1 keeps everything). Strata missing from ``rates`` are dropped
    unless ``default_rate`` is given. Deterministic: the same row set comes
    back for any partitioning, executor count, or run."""
    if not rates and default_rate is None:
        raise ValueError("need at least one stratum rate")
    # `is not None`, not truthiness: default_rate=0 must hit the >= 1 check
    # below (Spark's `h % 0` yields NULL and would silently drop every
    # non-listed stratum instead of raising)
    for r in list(rates.values()) + ([default_rate] if default_rate is not None else []):
        if int(r) < 1:
            raise ValueError("rates must be >= 1")
    h = sample_hash(F.col(id_col))
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | ((F.col(strata_col) == stratum) & (h % F.lit(int(rate)) == 0))
    if default_rate is not None:
        others = ~F.col(strata_col).isin(list(rates))
        cond = cond | (others & (h % F.lit(int(default_rate)) == 0))
    return df.filter(cond)
