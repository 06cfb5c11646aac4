"""Stateful sessionization stream (applyInPandasWithState): sessions close on
in-batch gaps and on event-time timeout when the watermark passes last+gap;
every emitted session must equal the batch-computed session set.
"""

import datetime as dt

import pytest

_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _row(conv, idx, h, m, text="hello world"):
    return (conv, idx, "user", text, "", dt.datetime(2026, 1, 1, h, m))


def _read_sink(spark, sink):
    import glob

    if not glob.glob(sink + "/*.parquet"):
        return []
    return {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"], r["sum_chars"])
        for r in spark.read.parquet(sink).collect()
    }


def test_sessionize_stream_matches_batch(spark, tmp_path_factory):
    from lucene_solr_spark.streaming.sessionize import sessionize_batch, sessionize_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = tmp_path_factory.mktemp("sess_stream")
    src, sink, ckpt = str(base / "src"), str(base / "sink"), str(base / "ckpt")

    def run_once():
        stream = spark.readStream.schema(_SCHEMA).parquet(src + "/b*")
        out = sessionize_stream(stream, gap="30 minutes", watermark="10 minutes")
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: conv A has an in-batch gap split (01:00,01:10 | 02:30); conv B
    # one turn. A's first session closes on the split; the trailing no-data
    # micro-batch then advances the watermark to 02:20 (02:30 - 10min) and
    # fires B's event-time timeout (01:05 + 30min = 01:35 < 02:20).
    b1 = [_row("A", 0, 1, 0), _row("A", 1, 1, 10), _row("A", 2, 2, 30), _row("B", 0, 1, 5)]
    spark.createDataFrame(b1, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    run_once()
    got1 = _read_sink(spark, sink)
    assert {(c, s.minute, e.minute, n) for c, s, e, n, _ in got1} == {
        ("A", 0, 10, 2),
        ("B", 5, 5, 1),
    }

    # batch 2: conv C at 06:00 pushes the watermark to 05:50, so A's open
    # session (timeout 02:30+30min = 03:00) fires; C (06:30) stays open.
    spark.createDataFrame([_row("C", 0, 6, 0)], _SCHEMA).coalesce(1).write.mode("append").parquet(
        src + "/b2"
    )
    run_once()
    got2 = _read_sink(spark, sink)
    assert {(c, s.minute, n) for c, s, e, n, _ in got2} == {
        ("A", 0, 2),
        ("B", 5, 1),
        ("A", 30, 1),
    }

    # batch 3: conv D at 10:00 → watermark 09:50 closes C; D stays open.
    spark.createDataFrame([_row("D", 0, 10, 0)], _SCHEMA).coalesce(1).write.mode("append").parquet(
        src + "/b3"
    )
    run_once()
    got3 = _read_sink(spark, sink)
    assert {(c, s.hour, s.minute, n) for c, s, e, n, _ in got3} == {
        ("A", 1, 0, 2),
        ("B", 1, 5, 1),
        ("A", 2, 30, 1),
        ("C", 6, 0, 1),
    }

    # every closed session must equal the batch-computed session exactly
    all_rows = b1 + [_row("C", 0, 6, 0), _row("D", 0, 10, 0)]
    batch = {
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"], r["sum_chars"])
        for r in sessionize_batch(
            spark.createDataFrame(all_rows, _SCHEMA), gap="30 minutes"
        ).collect()
    }
    assert got3 <= batch and len(got3) == 4


def test_sessionize_batch_splits_on_gap(spark):
    from lucene_solr_spark.streaming.sessionize import sessionize_batch

    rows = [_row("X", i, 1, m) for i, m in enumerate((0, 20, 40))] + [_row("X", 3, 3, 0)]
    got = sorted(
        (r["session_start"].minute, r["n_turns"])
        for r in sessionize_batch(spark.createDataFrame(rows, _SCHEMA), gap="30 minutes").collect()
    )
    assert got == [(0, 3), (0, 1)] or got == [(0, 1), (0, 3)]
