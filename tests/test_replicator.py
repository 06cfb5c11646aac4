"""lucene/replicator analog: revision publish + incremental replica sync."""

from lucene_solr_spark.operators.indexer import InvertedIndex
from lucene_solr_spark.operators.replicator import (
    latest_revision_version,
    publish_revision,
    read_revision,
    replicate,
)
from lucene_solr_spark.operators.searcher import IndexSearcher
from lucene_solr_spark.plans.query import TermQuery


def test_replicate_then_search_identical(spark, index8, spark_corpus, tmp_path):
    src, dst = str(tmp_path / "primary"), str(tmp_path / "replica")
    index8.write(src)
    rev = publish_revision(src)
    assert rev.version == 1 and rev.files and rev.total_bytes > 0

    stats = replicate(src, dst)
    assert stats["copied"] == len(rev.files) and stats["deleted"] == 0

    replica = IndexSearcher(InvertedIndex.read(spark, dst, index8.config), spark_corpus)
    primary = IndexSearcher(index8, spark_corpus)
    assert replica.search(TermQuery("wuloze"), 10).collect() == primary.search(
        TermQuery("wuloze"), 10
    ).collect()


def test_incremental_sync_copies_only_new_files(spark, index8, tmp_path):
    src, dst = str(tmp_path / "primary"), str(tmp_path / "replica")
    index8.write(src)
    publish_revision(src)
    replicate(src, dst)

    # new commit point: only the terms table is rewritten (append-mode still
    # produces fresh uniquely-named part files; old ones stay referenced)
    index8.terms.write.mode("append").parquet(f"{src}/terms")
    rev2 = publish_revision(src)
    assert rev2.version == 2

    stats = replicate(src, dst)
    assert stats["version"] == 2
    assert stats["copied"] > 0, "new segment files must transfer"
    assert stats["skipped"] > 0, "unchanged files must NOT transfer"
    assert stats["bytes_copied"] < rev2.total_bytes

    # a third cycle with no new revision is a no-op
    stats3 = replicate(src, dst)
    assert stats3["copied"] == 0 and stats3["skipped"] == len(rev2.files)


def test_gc_removes_unreferenced_files(spark, index8, tmp_path):
    src, dst = str(tmp_path / "primary"), str(tmp_path / "replica")
    index8.write(src)
    publish_revision(src)
    replicate(src, dst)

    # rewrite terms entirely: the old part files drop out of the revision
    index8.terms.write.mode("overwrite").parquet(f"{src}/terms")
    publish_revision(src)
    stats = replicate(src, dst)
    assert stats["deleted"] > 0
    assert latest_revision_version(dst) == 2
    assert set(read_revision(dst).files) == set(read_revision(src).files)
