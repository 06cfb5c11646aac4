"""Sorted-table fast path: shuffle-free doc-id assignment."""

import pytest


def test_sorted_source_ids_match_shuffle_path(spark, tmp_path_factory):
    from lucene_solr_spark.operators.indexer import assign_doc_ids, assign_doc_ids_sorted_source
    from lucene_solr_spark.sources.transcripts import transcripts_df_dist

    path = str(tmp_path_factory.mktemp("sortedsrc") / "corpus.parquet")
    transcripts_df_dist(spark, 500, n_partitions=8).write.mode("overwrite").parquet(path)

    a = (
        assign_doc_ids(spark.read.parquet(path), ("conv_id", "turn_idx"), n_partitions=4)
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        assign_doc_ids_sorted_source(spark, path)
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and a.equals(b)


def test_sorted_source_rejects_overlapping_files(spark, tmp_path_factory, fixture_corpus_pdf):
    from lucene_solr_spark.operators.indexer import assign_doc_ids_sorted_source

    path = str(tmp_path_factory.mktemp("unsorted") / "corpus.parquet")
    # hash-repartitioned write interleaves conv ranges across files
    df = spark.createDataFrame(fixture_corpus_pdf).repartition(4, "conv_id")
    df.write.mode("overwrite").parquet(path)
    with pytest.raises(ValueError, match="overlap"):
        assign_doc_ids_sorted_source(spark, path).count()


def test_fused_sorted_source_build_identical(spark, tmp_path_factory):
    """build_index_sorted_source (one Python pass) must be bit-identical to
    assign_doc_ids_sorted_source + build_index: same run/block layout, same
    postings bytes, same docs/norms, same collection stats."""
    from lucene_solr_spark.operators.indexer import (
        IndexConfig,
        assign_doc_ids_sorted_source,
        build_index,
        build_index_sorted_source,
    )
    from lucene_solr_spark.sources.transcripts import transcripts_df_dist

    path = str(tmp_path_factory.mktemp("fusedsrc") / "corpus.parquet")
    transcripts_df_dist(spark, 400, n_partitions=6).write.mode("overwrite").parquet(path)

    two_step = build_index(
        assign_doc_ids_sorted_source(spark, path), IndexConfig(n_partitions=None)
    )
    fused = build_index_sorted_source(spark, path, IndexConfig(n_partitions=None))

    assert fused.doc_count == two_step.doc_count
    assert fused.sum_ttf == two_step.sum_ttf

    key = ["term", "run_id", "block_id"]
    pa = two_step.postings.orderBy(*key).toPandas()
    pb = fused.postings.orderBy(*key).toPandas()
    assert len(pa) == len(pb)
    import pandas as pd

    pd.testing.assert_frame_equal(
        pa.reset_index(drop=True), pb.reset_index(drop=True)
    )
    da = two_step.docs.orderBy("doc_id").toPandas().reset_index(drop=True)
    db = fused.docs.orderBy("doc_id").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(da, db)
    ta = two_step.terms.orderBy("term").toPandas().reset_index(drop=True)
    tb = fused.terms.orderBy("term").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(ta, tb)


def test_footer_meta_matches_spark_scan(spark, tmp_path_factory):
    """The parquet-footer metadata route must produce the same file bases as
    the Spark aggregation fallback — equivalence pin for the zero-job pass."""
    from lucene_solr_spark.operators import indexer
    from lucene_solr_spark.sources.transcripts import transcripts_df_dist

    path = str(tmp_path_factory.mktemp("footermeta") / "corpus.parquet")
    transcripts_df_dist(spark, 300, n_partitions=5).write.mode("overwrite").parquet(path)

    _, bases_footer = indexer._sorted_source_scan(spark, path, ("conv_id", "turn_idx"))
    assert indexer._footer_file_meta(path, ["conv_id", "turn_idx"]) is not None

    orig = indexer._footer_file_meta
    try:
        indexer._footer_file_meta = lambda *_a, **_k: None  # force Spark fallback
        _, bases_spark = indexer._sorted_source_scan(spark, path, ("conv_id", "turn_idx"))
    finally:
        indexer._footer_file_meta = orig
    assert bases_footer == bases_spark


def test_sorted_source_fallback_path_ids(spark, tmp_path_factory, monkeypatch):
    """With the footer route disabled, the sorted-source id assignment still
    matches the shuffle path end-to-end (covers the Spark-scan fallback)."""
    from lucene_solr_spark.operators import indexer
    from lucene_solr_spark.sources.transcripts import transcripts_df_dist

    path = str(tmp_path_factory.mktemp("fallbacksrc") / "corpus.parquet")
    transcripts_df_dist(spark, 200, n_partitions=4).write.mode("overwrite").parquet(path)

    monkeypatch.setattr(indexer, "_footer_file_meta", lambda *_a, **_k: None)
    a = (
        indexer.assign_doc_ids(
            spark.read.parquet(path), ("conv_id", "turn_idx"), n_partitions=4
        )
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        indexer.assign_doc_ids_sorted_source(spark, path)
        .select("doc_id", "conv_id", "turn_idx")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and a.equals(b)
