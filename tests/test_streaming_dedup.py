"""Streaming exact dedup: stream-vs-batch equivalence on a corpus with
injected duplicates, plus checkpointed resume (a second availableNow run
emits nothing new)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dup_corpus(fixture_corpus_pdf):
    pdf = fixture_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).copy()
    pdf["doc_id"] = range(len(pdf))
    # duplicate every 7th row's text under a fresh doc_id (same ts window)
    dups = pdf.iloc[::7].copy()
    dups["doc_id"] = dups["doc_id"] + len(pdf)
    out = pd.concat([pdf, dups], ignore_index=True)
    return out[["doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def test_streaming_dedup_matches_batch(spark, dup_corpus, tmp_path_factory):
    from lucene_solr_spark.streaming.dedup import dedup_batch_control, start_streaming_dedup

    base = tmp_path_factory.mktemp("sdedup")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")

    df = spark.createDataFrame(dup_corpus)
    df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    q = start_streaming_dedup(spark, src, schema, out, ckpt, delay="365 days")
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    batch = dedup_batch_control(df)

    # exactly one survivor per distinct content key
    assert got.count() == batch.count()
    got_keys = {r["content_md5"] for r in got.select("content_md5").collect()}
    exp_keys = {r["content_md5"] for r in batch.select("content_md5").collect()}
    assert got_keys == exp_keys
    # no duplicate key leaked through
    assert got.groupBy("content_md5").count().filter("count > 1").count() == 0

    # resume from checkpoint: nothing new to emit
    q2 = start_streaming_dedup(spark, src, schema, out, ckpt, delay="365 days")
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == batch.count()
