"""BM25FQuery parity tests.

Brute-force float32 reference implementation of
``reference lucene/sandbox/src/java/org/apache/lucene/search/BM25FQuery.java``
+ ``MultiNormsLeafSimScorer.java`` over the fixture corpus, compared
bit-for-bit against the distributed plan (``operators/bm25f.py``).
"""

import re

import numpy as np
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.functions import bm25
from lucene_solr_spark.functions.analysis import simple_analyzer
from lucene_solr_spark.functions.smallfloat import LENGTH_TABLE, int_to_byte4
from lucene_solr_spark.operators.bm25f import bm25f_topk
from lucene_solr_spark.operators.indexer import IndexConfig, build_index


def _cfg(**kw):
    # simple_analyzer == the test's [a-z0-9]+ reference tokenizer, definitionally
    return IndexConfig(analyzer=simple_analyzer(), **kw)


def _tok(s: str):
    return re.findall(r"[a-z0-9]+", s.lower())


def _title(s: str, n=4):
    return " ".join(_tok(s)[:n])


def bm25f_brute(texts_by_field, weights, terms, k):
    """Pure-numpy BM25F: texts_by_field = [list[str] per field], same doc order."""
    field_tokens = [[_tok(t) for t in texts] for texts in texts_by_field]
    n = len(field_tokens[0])
    dls = [np.array([len(d) for d in docs], dtype=np.int64) for docs in field_tokens]

    # per (field, term) stats
    doc_freq, total_ttf = 0, 0
    tfs = []  # per field: dict term -> np.array tf per doc
    for docs, w in zip(field_tokens, weights):
        per_term = {}
        for t in terms:
            tf = np.array([d.count(t) for d in docs], dtype=np.int64)
            per_term[t] = tf
            df_t, ttf_t = int((tf > 0).sum()), int(tf.sum())
            if df_t:
                doc_freq = max(doc_freq, df_t)
                total_ttf = int(total_ttf + w * ttf_t)
        tfs.append(per_term)
    assert doc_freq > 0
    sum_ttf = 0
    for dl, w in zip(dls, weights):
        sum_ttf = int(sum_ttf + w * int(dl.sum()))
    avgdl = bm25.avg_field_length(sum_ttf, n)
    weight = np.float32(np.float32(1.0) * bm25.idf(doc_freq, n))
    cache = bm25.norm_cache(avgdl)

    freq = np.zeros(n, dtype=np.float64)
    any_match = np.zeros(n, dtype=bool)
    for per_term, w in zip(tfs, weights):
        for t in terms:
            freq += w * per_term[t]
            any_match |= per_term[t] > 0

    norm_value = np.zeros(n, dtype=np.float32)
    for dl, w in zip(dls, weights):
        norm_value = norm_value + np.float32(w) * LENGTH_TABLE[int_to_byte4(dl)]
    byte = int_to_byte4(np.floor(norm_value.astype(np.float64) + 0.5).astype(np.int64))
    t32 = (freq / (freq + cache[byte].astype(np.float64))).astype(np.float32)
    score = (weight * t32).astype(np.float32)

    ids = np.flatnonzero(any_match)
    order = sorted(ids, key=lambda i: (-score[i], i))[:k]
    return [(int(i), np.float32(score[i])) for i in order]


@pytest.fixture(scope="module")
def two_field(spark_corpus):
    corpus = spark_corpus.withColumn(
        "title",
        F.array_join(F.slice(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 4), " "),
    ).persist()
    idx_text = build_index(corpus, _cfg(n_partitions=8)).persist()
    idx_title = build_index(corpus, _cfg(text_col="title", n_partitions=8)).persist()
    pdf = corpus.select("doc_id", "text", "title").orderBy("doc_id").toPandas()
    return idx_text, idx_title, pdf


def test_bm25f_two_fields_rank_and_score_identity(two_field):
    idx_text, idx_title, pdf = two_field
    terms = ["numa", "wehu"]
    weights = [1.0, 2.0]
    expected = bm25f_brute([pdf["text"].tolist(), pdf["title"].tolist()], weights, terms, 10)

    got = bm25f_topk(
        [("text", idx_text, 1.0), ("title", idx_title, 2.0)], terms, k=10
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == expected


def test_bm25f_equal_weights_differs_from_single_field(two_field, searcher):
    # sanity: blending actually changes norms/stats vs a plain text TermQuery
    idx_text, idx_title, pdf = two_field
    got = bm25f_topk([("text", idx_text, 1.0), ("title", idx_title, 1.0)], ["vecodu"], k=10).collect()
    expected = bm25f_brute([pdf["text"].tolist(), pdf["title"].tolist()], [1.0, 1.0], ["vecodu"], 10)
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == expected


def test_bm25f_single_pair_termscorer_fallback(spark):
    # exactly one present (field, term) pair -> TermScorer path
    # (BM25FQuery.java:342-351): raw tf, single-field norms, pseudo weight
    rows = [(i, f"alpha beta gamma {'zeta ' * (i % 3)}".strip(), "alpha beta") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, body string, head string")
    idx_body = build_index(df, _cfg(text_col="body", n_partitions=2))
    idx_head = build_index(df, _cfg(text_col="head", n_partitions=2))

    got = bm25f_topk([("body", idx_body, 1.0), ("head", idx_head, 3.0)], ["zeta"], k=5).collect()
    # brute: pseudo stats over both fields, but score = plain TermScorer on body
    body = [r[1] for r in rows]
    head = [r[2] for r in rows]
    n = len(rows)
    tf = np.array([_tok(b).count("zeta") for b in body], dtype=np.int64)
    doc_freq = int((tf > 0).sum())
    dl_body = np.array([len(_tok(b)) for b in body], dtype=np.int64)
    dl_head = np.array([len(_tok(h)) for h in head], dtype=np.int64)
    sum_ttf = int(int(1.0 * dl_body.sum()) + 3.0 * dl_head.sum())
    avgdl = bm25.avg_field_length(sum_ttf, n)
    weight = np.float32(np.float32(1.0) * bm25.idf(doc_freq, n))
    cache = bm25.norm_cache(avgdl)
    score = bm25.score_tf_norm(tf, int_to_byte4(dl_body), weight, cache)
    ids = np.flatnonzero(tf > 0)
    expected = [(int(i), np.float32(score[i])) for i in sorted(ids, key=lambda i: (-score[i], i))[:5]]
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == expected


def test_bm25f_rejects_sub_one_weight(two_field):
    idx_text, idx_title, _ = two_field
    with pytest.raises(ValueError):
        bm25f_topk([("text", idx_text, 0.5)], ["error"])
