"""Event-time windowed aggregation streams with watermark-bounded state.

The reference's ``TimeSeriesStream`` (``reference solr/solrj/src/java/org/
apache/solr/client/solrj/io/stream/TimeSeriesStream.java``) computes
date-bucketed metrics as a pull query, and its streaming surface
(``TopicStream``/``DaemonStream``) replays by version checkpoint with **no
event-time semantics** — no watermarks, no late-data policy (SURVEY.md §2.7
note).  This module is the Spark-native upgrade of that operator: the same
time-bucketed aggregation as a *live* Structured Streaming query where

- the event-time column drives tumbling/sliding ``window()`` buckets,
- ``withWatermark`` bounds the aggregation state (at 10^12-turn scale an
  unbounded window state is a driver OOM — the watermark is what makes the
  operator runnable forever), and
- rows arriving later than the watermark are dropped deterministically,
  finalized windows are emitted exactly once (append mode).

Batch equivalence: ``time_series_batch`` runs the identical plan over a
static DataFrame — the control for the control-vs-distributed test pattern.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["windowed_time_series", "time_series_batch"]


def _default_aggs():
    return [
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.length("text")).alias("sum_chars"),
    ]


def windowed_time_series(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "30 minutes",
    group_cols: tuple = (),
    aggs: Optional[list] = None,
) -> DataFrame:
    """Windowed aggregation over a streaming DataFrame (attach a
    ``writeStream`` in append mode; finalized windows emit once the
    watermark passes the window end)."""
    # watermarks require TIMESTAMP (with zone); Iceberg/parquet tables often
    # carry TIMESTAMP_NTZ — cast transparently
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = stream_df.withWatermark(ts_col, watermark)
    return (
        w.groupBy(F.window(F.col(ts_col), window_len, slide or window_len), *group_cols)
        .agg(*(aggs or _default_aggs()))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "*",
        )
        .drop("window")
    )


def time_series_batch(
    df: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    slide: Optional[str] = None,
    group_cols: tuple = (),
    aggs: Optional[list] = None,
) -> DataFrame:
    """The identical windowed aggregation over a static DataFrame (the
    TimeSeriesStream pull-query shape; control for stream-vs-batch tests)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window_len, slide or window_len), *group_cols)
        .agg(*(aggs or _default_aggs()))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "*",
        )
        .drop("window")
    )
