"""Ingestion loaders (JsonLoader/CSVLoader analog) and update semantics
(updateDocuments delete-by-term + add; version resolution; atomic set)."""

import datetime

import pytest

from lucene_solr_spark.sources.ingest import (
    TRANSCRIPT_SCHEMA,
    apply_updates,
    atomic_set,
    read_documents,
    split_malformed,
)


def _base(spark):
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "hello", None, ts),
        ("c1", 1, "assistant", "hi there", "bash", ts),
        ("c2", 0, "user", "query", None, ts),
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_read_json_and_csv_roundtrip(spark, tmp_path):
    df = _base(spark)
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    df.write.json(jdir)
    df.write.option("header", True).csv(cdir)
    got_j = read_documents(spark, jdir, fmt="json")
    got_c = read_documents(spark, cdir, fmt="csv")
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, got_j.collect())) == want
    assert sorted(map(tuple, got_c.collect())) == want
    assert got_j.schema == TRANSCRIPT_SCHEMA


def test_split_malformed(spark, tmp_path):
    p = str(tmp_path / "bad")
    with open(p + ".json", "w") as f:
        f.write('{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "ok"}\n')
        f.write('{"conv_id": null, "turn_idx": 1, "role": "user", "text": "no id"}\n')
        f.write('{"conv_id": "c2", "role": "user", "text": "no turn_idx"}\n')
    df = read_documents(spark, p + ".json", fmt="json")
    good, bad = split_malformed(df)
    assert good.count() == 1 and bad.count() == 2


def test_apply_updates_delete_then_add(spark):
    base = _base(spark)
    ts = datetime.datetime(2026, 2, 2)
    upd = spark.createDataFrame([("c1", 1, "assistant", "REVISED", "python", ts)], TRANSCRIPT_SCHEMA)
    out = apply_updates(base, upd)
    assert out.count() == 3
    row = out.filter("conv_id = 'c1' AND turn_idx = 1").collect()[0]
    assert row["text"] == "REVISED" and row["tool"] == "python"


def test_apply_updates_version_resolution(spark):
    schema = "conv_id string, turn_idx int, text string, version long"
    base = spark.createDataFrame([("c1", 0, "v5", 5), ("c1", 1, "v3", 3)], schema)
    upd = spark.createDataFrame([("c1", 0, "stale", 4), ("c1", 1, "fresh", 7), ("c9", 0, "new", 1)], schema)
    out = {(r["conv_id"], r["turn_idx"]): r["text"] for r in apply_updates(base, upd, version_col="version").collect()}
    # higher version wins; lower-version update is rejected (optimistic concurrency)
    assert out == {("c1", 0): "v5", ("c1", 1): "fresh", ("c9", 0): "new"}

    # equal versions: the update wins the tie
    upd2 = spark.createDataFrame([("c1", 0, "tied", 5)], schema)
    out2 = {(r["conv_id"], r["turn_idx"]): r["text"] for r in apply_updates(base, upd2, version_col="version").collect()}
    assert out2[("c1", 0)] == "tied"


def test_atomic_set_preserves_other_fields(spark):
    base = _base(spark)
    partial = spark.createDataFrame([("c1", 1, "sql")], "conv_id string, turn_idx int, tool string")
    out = atomic_set(base, partial)
    assert out.count() == 3
    row = out.filter("conv_id = 'c1' AND turn_idx = 1").collect()[0]
    assert row["tool"] == "sql" and row["text"] == "hi there"  # text untouched
    # docs not in the partial batch are untouched; unknown ids ignored
    assert out.filter("conv_id = 'c2'").collect()[0]["tool"] is None
