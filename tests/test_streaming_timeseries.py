"""Watermarked windowed time-series stream: late data dropped, finalized
windows emitted exactly once, stream result == batch result for on-time data.
"""

import datetime as dt

import pytest


def _rows(hours_minutes, base=dt.datetime(2026, 1, 1)):
    return [
        (f"c{i}", i, "user", "x" * (i + 1), "", base + dt.timedelta(hours=h, minutes=m))
        for i, (h, m) in enumerate(hours_minutes)
    ]


_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_stream_windows_with_watermark_and_late_drop(spark, tmp_path_factory):
    from lucene_solr_spark.streaming.timeseries import time_series_batch, windowed_time_series

    base = tmp_path_factory.mktemp("ts_stream")
    src, sink, ckpt = str(base / "src"), str(base / "sink"), str(base / "ckpt")

    def run_once():
        stream = spark.readStream.schema(_SCHEMA).parquet(src + "/b*")
        out = windowed_time_series(stream, window_len="1 hour", watermark="10 minutes")
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: hours 1..3. The watermark advances to 03:20 at the END of
    # this run (watermarks update between micro-batches), so nothing is
    # emitted yet.
    b1 = _rows([(1, 5), (1, 40), (2, 10), (3, 30)])
    spark.createDataFrame(b1, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    run_once()

    # batch 2: one LATE row in hour 1 (behind the 03:20 watermark → dropped
    # from state) and an on-time row in hour 4. This run emits the windows
    # already behind the watermark: h1 (on-time count only) and h2.
    b2 = _rows([(1, 20), (4, 30)])
    spark.createDataFrame(b2, _SCHEMA).coalesce(1).write.mode("append").parquet(src + "/b2")
    run_once()

    # batch 3: an hour-5 row; the 04:20 watermark from batch 2 finalizes h3.
    b3 = _rows([(5, 30)])
    spark.createDataFrame(b3, _SCHEMA).coalesce(1).write.mode("append").parquet(src + "/b3")
    run_once()

    rows_out = spark.read.parquet(sink).collect()
    got = {r["window_start"].hour: r["cnt"] for r in rows_out}
    # h1 emitted with the ON-TIME count (2 — the late row was dropped from
    # state by the watermark); h4 finalizes in run 3's trailing no-data
    # micro-batch once the watermark reaches 05:20; h5 still open
    assert got == {1: 2, 2: 1, 3: 1, 4: 1}
    # exactly-once: each window emitted a single time
    assert len(rows_out) == len(got)

    # control: the identical plan over all ON-TIME static data (everything
    # except the late h1 row) must agree on every emitted window
    on_time = spark.createDataFrame(b1 + b2[1:] + b3, _SCHEMA)
    batch = {
        r["window_start"].hour: r["cnt"]
        for r in time_series_batch(on_time).collect()
    }
    assert {h: batch[h] for h in got} == got


def test_batch_time_series_grouped(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.streaming.timeseries import time_series_batch

    rows = _rows([(1, 0), (1, 30), (2, 0)])
    df = spark.createDataFrame(rows, _SCHEMA)
    out = time_series_batch(df, group_cols=("role",), aggs=[F.count(F.lit(1)).alias("cnt")])
    got = sorted((r["window_start"].hour, r["role"], r["cnt"]) for r in out.collect())
    assert got == [(1, "user", 2), (2, "user", 1)]
