"""CheckIndex analog + filter cache + sloppy phrase tests."""

import numpy as np
import pytest

from lucene_solr_spark.plans.query import BooleanQuery, PhraseQuery, TermQuery


def test_check_index_passes_on_valid(index8):
    from lucene_solr_spark.operators.checkindex import check_index

    summary = check_index(index8, full=True)
    assert summary["doc_count"] == index8.doc_count
    assert summary["n_blocks"] > 0 and summary["decode_checked"]


def test_check_index_catches_corruption(spark, index8):
    from dataclasses import replace

    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.checkindex import CheckIndexError, check_index

    # corrupt the impacts: max_tf = 0 violates the basic invariant
    bad = index8.postings.withColumn("max_tf", F.lit(0))
    with pytest.raises(CheckIndexError):
        check_index(replace(index8, postings=bad), full=False)

    # corrupt stats: doc_count off by one
    with pytest.raises(CheckIndexError):
        check_index(replace(index8, doc_count=index8.doc_count + 1), full=False)


def test_filter_cache_hits_and_identity(searcher):
    q = BooleanQuery.build(must=[TermQuery("the")], filter=[TermQuery("and")])
    r1 = [(d, float(np.float32(s))) for d, s in searcher.search(q, 10).collect()]
    assert TermQuery("and") in searcher._filter_cache  # populated
    cached_df = searcher._filter_cache[TermQuery("and")]
    r2 = [(d, float(np.float32(s))) for d, s in searcher.search(q, 10).collect()]
    assert r1 == r2
    assert searcher._filter_cache[TermQuery("and")] is cached_df  # reused


def test_sloppy_phrase_superset_of_exact(searcher, oracle):
    exact = searcher.search(PhraseQuery(("the", "and")), 50).collect()
    sloppy = searcher.search(PhraseQuery(("the", "and"), slop=3), 50).collect()
    exact_ids = {d for d, _ in exact}
    sloppy_ids = {d for d, _ in sloppy}
    # every exact match also matches with slop
    assert exact_ids <= sloppy_ids or len(sloppy_ids) == 50


def test_usage_tracking_cache_policy(index8, spark_corpus):
    """UsageTrackingQueryCachingPolicy analog: a filter is admitted to the
    persisted cache only after min_uses sightings; results identical either
    way."""
    from lucene_solr_spark.operators.searcher import IndexSearcher

    s = IndexSearcher(index8, spark_corpus, filter_cache_min_uses=2, prune_min_postings=0)
    q = BooleanQuery.build(must=[TermQuery("the")], filter=[TermQuery("and")])
    r1 = s.search(q, 10).collect()
    assert TermQuery("and") not in s._filter_cache  # seen once: not admitted
    r2 = s.search(q, 10).collect()
    assert TermQuery("and") in s._filter_cache  # second sighting admits
    r3 = s.search(q, 10).collect()
    assert r1 == r2 == r3
