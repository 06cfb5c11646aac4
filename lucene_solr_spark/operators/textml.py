"""Text-ML streams — FeaturesSelectionStream / TextLogitStream analogs.

Reference semantics:

- **Information-gain feature selection** (``solr/core/src/java/org/apache/
  solr/search/IGainTermsQParserPlugin.java:156-207``, driven by
  ``solrj/.../io/stream/FeaturesSelectionStream.java``): for a binary
  outcome, each term scores
  ``IG(t) = H(pc) - [ df/N · H(xc/df) + (1 - df/N) · H((P - xc)/(N - df + 1)) ]``
  with ``H`` the natural-log binary entropy (0 at p ∈ {0, 1}), ``N`` docs,
  ``P`` positives, ``xc`` positive docs containing t, ``df = xc + nc``.
  The stream also attaches ``idf = ln(N / (df + 1))`` per selected term
  (``FeaturesSelectionStream.java:371-373``).

- **Distributed logistic regression** (``solr/core/src/java/org/apache/solr/
  search/TextLogisticRegressionQParserPlugin.java:175-215``, coordinated by
  ``solrj/.../io/stream/TextLogitStream.java:455-500``): doc vector
  ``[1, idf_i · (1 + ln tf_i), ...]`` (docs containing no feature term are
  skipped); each shard runs sequential SGD
  ``w -= α · (σ(v·w) - y) · v`` over its docs, reporting
  ``Σ |σ(v·w0) - y|`` against the iteration-start weights; the coordinator
  *averages* the shard weight vectors, then adapts α (×0.5 when the error
  did not improve, ×1.05 when it did — :489-494).

Scale shape: IG is two hash aggregations (distinct doc-term pairs → counts
per (term, class)); logit is one tiny broadcast (weights) + one
``mapInPandas`` pass per iteration with a driver-side average of
|partitions| × (|terms|+1) numbers — the exact shard/coordinator split of
the reference, with Spark partitions playing the shards.  One deliberate
deviation: the reference iterates docs in HashMap order (nondeterministic);
we iterate in doc_id order so runs are bitwise-reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .classify import _doc_terms

__all__ = ["igain_terms", "text_logit"]


def _entropy(p):
    """binaryEntropy (IGainTermsQParserPlugin.java:203-207) as a Column."""
    return F.when((p <= 0) | (p >= 1), F.lit(0.0)).otherwise(
        -p * F.log(p) - (F.lit(1.0) - p) * F.log(F.lit(1.0) - p)
    )


def igain_terms(
    index,
    corpus: DataFrame,
    outcome_col: str,
    positive_value,
    top_n: int = 20,
) -> DataFrame:
    """(term, score, doc_freq, idf) for the top_n terms by information gain
    about ``outcome_col == positive_value``.  All-built-in aggregations."""
    cfg = index.config
    id_col = cfg.id_col
    labeled = corpus.select(
        F.col(id_col).alias("doc_id"),
        (F.col(outcome_col) == F.lit(positive_value)).cast("int").alias("y"),
    )
    n_docs = labeled.count()
    n_pos = labeled.agg(F.sum("y")).collect()[0][0] or 0
    pc = F.lit(float(n_pos) / float(n_docs))
    ent_c = _entropy(pc)

    pairs = _doc_terms(corpus, cfg).join(labeled, "doc_id")
    tc = pairs.groupBy("term").agg(
        F.sum("y").cast("double").alias("xc"),
        F.count("*").cast("double").alias("df"),
    )
    nd, npos = F.lit(float(n_docs)), F.lit(float(n_pos))
    h_in = _entropy(F.col("xc") / F.col("df"))
    h_out = _entropy((npos - F.col("xc")) / (nd - F.col("df") + 1))
    score = ent_c - ((F.col("df") / nd) * h_in + (F.lit(1.0) - F.col("df") / nd) * h_out)
    return (
        tc.select(
            "term",
            score.alias("score"),
            F.col("df").cast("bigint").alias("doc_freq"),
            F.log(nd / (F.col("df") + 1)).alias("idf"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top_n)
    )


def text_logit(
    index,
    corpus: DataFrame,
    terms: list,
    outcome_col: str,
    positive_value,
    iterations: int = 10,
    alpha: float = 0.01,
    n_partitions: int = 8,
) -> dict:
    """Train the reference's logistic classifier over feature ``terms``.

    Returns {"weights": [...], "errors": [per-iteration total error],
    "terms": terms, "idfs": [...]}.
    """
    cfg = index.config
    id_col = cfg.id_col
    n_docs = corpus.count()
    dt = _doc_terms(corpus, cfg).filter(F.col("term").isin(list(terms)))
    dfreq = {r["term"]: r["df"] for r in dt.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()}
    idfs = np.array([np.log(float(n_docs) / (dfreq.get(t, 0) + 1.0)) for t in terms])
    t_index = {t: i for i, t in enumerate(terms)}

    labeled = corpus.select(
        F.col(id_col).alias("doc_id"),
        (F.col(outcome_col) == F.lit(positive_value)).cast("double").alias("y"),
    )
    spark = corpus.sparkSession
    tmap = F.broadcast(
        spark.createDataFrame(pd.DataFrame({"term": list(terms), "idx": [t_index[t] for t in terms]}))
    )
    feats = (
        dt.join(tmap, "term")
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("idx", "tf")).alias("fts"))
        .join(labeled, "doc_id")
        .repartitionByRange(n_partitions, "doc_id")
        .sortWithinPartitions("doc_id")
        .persist()
    )
    n_feat = len(terms) + 1
    weights = np.ones(n_feat)
    errors = []
    last_error = None
    lr = float(alpha)
    for _ in range(iterations):
        w0 = weights.copy()
        b_w0, b_idfs, b_lr = w0.tolist(), idfs.tolist(), lr

        def shard(iterator):
            w = np.array(b_w0)
            wstart = np.array(b_w0)
            idf = np.array(b_idfs)
            err = 0.0
            seen = False
            for pdf in iterator:
                if not len(pdf):
                    continue
                seen = True
                # build the batch's dense feature matrix in one vectorized
                # pass (the reference's per-doc vector fill, hoisted out of
                # the sample loop); the weight updates below stay sequential
                # — that IS the reference's per-shard SGD semantics
                fts_col = pdf["fts"].tolist()
                n = len(pdf)
                V = np.zeros((n, len(w)))
                V[:, 0] = 1.0
                counts = np.fromiter((len(f) for f in fts_col), dtype=np.int64, count=n)
                if counts.sum():
                    flat_idx = np.fromiter(
                        (r["idx"] for f in fts_col for r in f), dtype=np.int64
                    )
                    flat_tf = np.fromiter(
                        (r["tf"] for f in fts_col for r in f), dtype=np.float64
                    )
                    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
                    V[rows, flat_idx + 1] = idf[flat_idx] * (1.0 + np.log(flat_tf))
                ys = pdf["y"].to_numpy(dtype=np.float64)
                # iteration-start error is w-independent: one matmul
                sig0 = 1.0 / (1.0 + np.exp(-(V @ wstart)))
                err += float(np.abs(sig0 - ys).sum())
                for i in range(n):  # sequential SGD, reference order
                    v = V[i]
                    sig = 1.0 / (1.0 + np.exp(-float(v @ w)))
                    w -= (b_lr * (sig - ys[i])) * v
            if seen:
                yield pd.DataFrame({"weights": [w.tolist()], "error": [err]})

        out = feats.mapInPandas(shard, "weights array<double>, error double").collect()
        if not out:
            break
        weights = np.mean([np.array(r["weights"]) for r in out], axis=0)
        error = float(sum(r["error"] for r in out))
        errors.append(error)
        if last_error is not None:  # TextLogitStream.java:489-494
            lr = lr * 0.5 if last_error <= error else lr * 1.05
        last_error = error
    feats.unpersist()
    return {"weights": weights.tolist(), "errors": errors, "terms": list(terms), "idfs": idfs.tolist()}
