"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over the sf0.001 documents corpus.
``queries()`` / ``oracle_sql()`` — operator registry from SURVEY.md §2,
implemented in :mod:`lucene_solr_spark.driver_contract`; every Spark query is
paired with a DuckDB-runnable ANSI-SQL re-derivation with matching column
names and integer-typed compare columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 for a boolean
    query over the documents corpus, with stored-field fetch."""
    from lucene_solr_spark.driver_contract import HOT, MID, doc_searcher
    from lucene_solr_spark.plans.query import BooleanQuery, TermQuery

    s = doc_searcher(spark, "/root/testdata/sf0.001")
    q = BooleanQuery.build(should=[TermQuery(HOT), TermQuery(MID)])
    top = s.search(q, 10)
    return s.fetch(top, columns=["text", "lang"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucene_solr_spark import driver_contract as dc

    out: dict = {}
    out.update(dc.ft_queries())
    for mod_loader in ("agg_queries", "pipeline_queries"):
        fn = getattr(dc, mod_loader, None)
        if fn is not None:
            out.update(fn())
    return out


def oracle_sql() -> dict[str, str]:
    from lucene_solr_spark import driver_contract as dc

    out: dict = {}
    out.update(dc.ft_oracle_sql())
    for mod_loader in ("agg_oracle_sql", "pipeline_oracle_sql"):
        fn = getattr(dc, mod_loader, None)
        if fn is not None:
            out.update(fn())
    return out
