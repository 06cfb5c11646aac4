"""Custom stateful streaming operator: conversation sessionization with
``applyInPandasWithState``.

The reference's stateful streaming surface is ``TopicStream`` /
``DaemonStream`` (version-checkpointed replay, ``reference solr/solrj/src/
java/org/apache/solr/client/solrj/io/stream/TopicStream.java:71-85``) — it
has no per-key state machine at all (SURVEY.md §2.7 note).  This module adds
the canonical one for transcript corpora: split each conversation's turn
stream into *sessions* separated by an inactivity gap, as an arbitrary
stateful operator:

- grouped by ``conv_id`` (the state key — Spark hash-partitions keys across
  executors, so state scales horizontally with the cluster);
- per-key state = the currently open session (start/last ts, turn count,
  char count), a few dozen bytes per live conversation;
- event-time timeout closes a session exactly when the watermark passes
  ``last_ts + gap`` — late turns behind the watermark are dropped
  deterministically, finalized sessions are emitted exactly once.

``sessionize_batch`` is the identical computation as a static DataFrame plan
(lag + cumsum session ids) — the control for stream-vs-batch equivalence
tests, and the shape to use in backfills.

Scale note: state is O(live conversations), not O(turns); the only shuffle
is the groupBy(conv_id) hash exchange that any per-conversation operator
needs. The per-batch work is vectorized pandas over Arrow batches (no
per-row Python in the hot loop beyond the per-key state update).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize_stream", "sessionize_batch", "SESSION_SCHEMA"]

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("sum_chars", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("sum_chars", T.LongType()),
    ]
)

_EPOCH = dt.datetime(1970, 1, 1)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _ts(us: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(microseconds=us)


def _make_fn(gap_us: int):
    def fn(key, pdf_iter, state: GroupState):
        conv_id = key[0]
        closed = []
        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is final
            start_us, last_us, n, chars = state.get
            closed.append((conv_id, _ts(start_us), _ts(last_us), n, chars))
            state.remove()
        else:
            rows = pd.concat(list(pdf_iter), ignore_index=True)
            rows = rows.sort_values("ts")
            ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            chars_arr = rows["text"].str.len().astype("int64").to_numpy()
            cur = list(state.get) if state.exists else None
            for t, c in zip(ts_us, chars_arr):
                t, c = int(t), int(c)
                if cur is None:
                    cur = [t, t, 1, c]
                elif t - cur[1] > gap_us:
                    closed.append((conv_id, _ts(cur[0]), _ts(cur[1]), cur[2], cur[3]))
                    cur = [t, t, 1, c]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += c
            state.update(tuple(cur))
            # close when the watermark passes last + gap; the timeout must be
            # strictly beyond the current watermark, so clamp (a session
            # already behind it closes on the next trigger)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] // 1000 + gap_us // 1000, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                closed, columns=["conv_id", "session_start", "session_end", "n_turns", "sum_chars"]
            )

    return fn


def sessionize_stream(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization (attach a ``writeStream`` in append mode)."""
    gap_us = _parse_gap_us(gap)
    if dict(stream_df.dtypes).get(ts_col) == "timestamp_ntz":
        stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = stream_df.withWatermark(ts_col, watermark).select("conv_id", ts_col, "text")
    return w.groupBy("conv_id").applyInPandasWithState(
        _make_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _parse_gap_us(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600, "hours": 3600}[
        unit
    ]
    return int(qty) * mult * 1_000_000


def sessionize_batch(df: DataFrame, gap: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    """The identical sessionization over a static DataFrame: session breaks
    where the gap to the previous turn exceeds `gap`, session ids by running
    sum over the per-conversation window — one shuffle on conv_id, the same
    key layout as the stream."""
    from pyspark.sql import Window

    gap_us = _parse_gap_us(gap)
    w = Window.partitionBy("conv_id").orderBy(ts_col)
    ts_us = (F.col(ts_col).cast("double") * 1_000_000).cast("long")
    brk = (
        F.when(F.lag(ts_us).over(w).isNull(), F.lit(1))
        .when(ts_us - F.lag(ts_us).over(w) > F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    sess = df.select(
        "conv_id",
        F.col(ts_col).alias("ts"),
        F.length("text").cast("long").alias("chars"),
    ).withColumn("session_no", F.sum(brk).over(w))
    return (
        sess.groupBy("conv_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_turns"),
            F.sum("chars").cast("long").alias("sum_chars"),
        )
        .drop("session_no")
    )
