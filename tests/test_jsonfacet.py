"""JSON Facet interpreter: pandas recomputation parity for nested terms
facets, stat sorting, index order, and the unique agg."""

import pandas as pd
import pytest

from lucene_solr_spark.operators.jsonfacet import json_facet


@pytest.fixture(scope="module")
def docs(spark_corpus):
    from pyspark.sql import functions as F

    return spark_corpus.select(
        "doc_id", "role", "tool", F.length("text").alias("n_chars")
    ).persist()


@pytest.fixture(scope="module")
def pdf(docs):
    return docs.toPandas()


def test_single_level_stat_sort(docs, pdf):
    spec = {
        "name": "role",
        "field": "role",
        "limit": 2,
        "sort": "chars desc",
        "stats": {"chars": "sum(n_chars)"},
    }
    got = json_facet(docs, spec).collect()
    g = pdf.groupby("role").agg(count=("role", "size"), chars=("n_chars", "sum")).reset_index()
    g = g.sort_values(["chars", "role"], ascending=[False, True]).head(2)
    assert [(r["role"], r["role_count"], r["role_chars"]) for r in got] == [
        (t.role, t.count, t.chars) for t in g.itertuples()
    ]


def test_index_sort(docs, pdf):
    spec = {"name": "role", "field": "role", "limit": 3, "sort": "index asc"}
    got = [r["role"] for r in json_facet(docs, spec).collect()]
    assert got == sorted(pdf["role"].unique())[:3]


def test_nested_per_parent_limit(docs, pdf):
    spec = {
        "name": "role",
        "field": "role",
        "limit": 2,
        "sort": "count desc",
        "facet": {
            "name": "tool",
            "field": "tool",
            "limit": 2,
            "sort": "count desc",
            "stats": {"uniq": "unique(doc_id)"},
        },
    }
    got = json_facet(docs, spec).collect()
    roles = (
        pdf.groupby("role").size().reset_index(name="n")
        .sort_values(["n", "role"], ascending=[False, True]).head(2)["role"].tolist()
    )
    want = []
    for role in sorted(roles):
        sub = pdf[pdf["role"] == role]
        g = sub.groupby("tool").agg(n=("tool", "size"), u=("doc_id", "nunique")).reset_index()
        g = g.sort_values(["n", "tool"], ascending=[False, True]).head(2)
        for t in g.itertuples():
            want.append((role, t.tool, t.n, t.u))
    got_rows = sorted((r["role"], r["tool"], r["tool_count"], r["tool_uniq"]) for r in got)
    assert got_rows == sorted(want)
    # ancestor stats ride along on every child row
    role_counts = pdf.groupby("role").size().to_dict()
    for r in got:
        assert r["role_count"] == role_counts[r["role"]]


def test_unknown_stat_rejected(docs):
    with pytest.raises(ValueError):
        json_facet(docs, {"field": "role", "stats": {"p": "percentile(n_chars,50)"}})
    with pytest.raises(ValueError):
        json_facet(docs, {"field": "role", "sort": "nope desc"})
