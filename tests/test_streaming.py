"""Incremental (NRT) indexing: streamed runs must equal the batch build.

Control-vs-distributed pattern (SURVEY.md §5): the same corpus indexed (a)
in one batch and (b) as two streamed micro-batches must give identical
search results; the merge policy must then absorb the streamed runs without
changing them either.
"""

import numpy as np
import pytest

from lucene_solr_spark.plans.query import BooleanQuery, TermQuery


def _topk(searcher, q, k=10):
    return [(d, float(np.float32(s))) for d, s in searcher.search(q, k).collect()]


@pytest.fixture(scope="module")
def queries():
    return [
        TermQuery("the"),
        BooleanQuery.build(should=[TermQuery("wolo"), TermQuery("zumo")]),
        BooleanQuery.build(must=[TermQuery("the"), TermQuery("and")]),
    ]


def test_streamed_index_matches_batch(spark, fixture_corpus_pdf, searcher, tmp_path_factory, queries):
    from lucene_solr_spark.operators.searcher import IndexSearcher
    from lucene_solr_spark.streaming.incremental import (
        open_streamed_index,
        start_incremental_indexing,
        stored_corpus,
    )

    base = tmp_path_factory.mktemp("stream")
    src, idxp, ckpt = str(base / "src"), str(base / "index"), str(base / "ckpt")

    # the stream must deliver rows in stable order chunks: chunk by conv_id
    # prefix so (conv_id, turn_idx) order is preserved across batches
    pdf = fixture_corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cut = pdf["conv_id"].searchsorted("conv00000100", side="left")
    df_all = spark.createDataFrame(pdf)

    # drop chunk 1, drain the stream, then chunk 2, drain again
    spark.createDataFrame(pdf.iloc[:cut]).coalesce(1).write.mode("overwrite").parquet(src + "/c1")
    q1 = start_incremental_indexing(spark, src + "/c*", idxp, ckpt, df_all.schema, n_partitions=2)
    q1.awaitTermination(120)
    spark.createDataFrame(pdf.iloc[cut:]).coalesce(1).write.mode("append").parquet(src + "/c2")
    q2 = start_incremental_indexing(spark, src + "/c*", idxp, ckpt, df_all.schema, n_partitions=2)
    q2.awaitTermination(120)

    idx = open_streamed_index(spark, idxp)
    assert idx.doc_count == len(pdf)
    # doc_ids are dense and monotone in (conv_id, turn_idx) across batches
    ids = [r["doc_id"] for r in idx.docs.orderBy("doc_id").collect()]
    assert ids == list(range(len(pdf)))

    s2 = IndexSearcher(idx, stored_corpus(spark, idxp))
    for q in queries:
        assert _topk(s2, q) == _topk(searcher, q)

    # the merge policy absorbs streamed runs with identical results
    from lucene_solr_spark.operators.merge import TieredMergePolicy, maybe_merge, run_manifest

    merged = maybe_merge(idx, TieredMergePolicy(floor_segment_bytes=10 * 1024**2, segs_per_tier=1.0))
    assert len(run_manifest(merged)) < len(run_manifest(idx))
    s3 = IndexSearcher(merged, stored_corpus(spark, idxp))
    for q in queries:
        assert _topk(s3, q) == _topk(searcher, q)
