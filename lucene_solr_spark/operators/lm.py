"""Bigram language-model perplexity scoring — the "perplexity filter" stage
of a training-data pipeline (no reference analog; task-brief surface: rank /
filter documents by how well a corpus-trained LM predicts them, the KenLM
role in C4/CCNet-style cleaning).

Model: add-one-smoothed bigram LM trained on the corpus itself,

    P(w2 | w1) = (count(w1 w2) + 1) / (count(w1 ·) + V)

with ``V`` = distinct token types corpus-wide.  Each bigram contributes
``floor(float32(ln P) · 2^20)`` — the same order-free fixed-point contract
as the NaiveBayes classifier (`operators/classify.py`): quantizing the
per-bigram float32 log-probability to an integer BEFORE summing makes the
per-doc sum associative and bitwise-identical across engines, so the DuckDB
oracle can replay it exactly.

Plan shape at scale: the bigram exchange is the only corpus-sized shuffle
(map-side partial aggregation collapses hot bigrams), then two key-joins
attach the counts back (AQE handles skewed heads like "the …"), then one
doc-keyed sum.  ``V`` is a single scalar (one distinct-count job).  All
expressions are codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bigram_logprob"]

_Q = 1 << 20  # 2^-20 fixed point, matches classify.py / tl_igain


def bigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quantized bigram log-likelihood.

    Returns ``(doc_id, n_bigrams, logprob_q)`` where ``logprob_q`` is the
    exact integer sum of per-bigram ``floor(float32(ln P) · 2^20)``; average
    log-prob (for thresholding) is ``logprob_q / (n_bigrams · 2^20)`` and
    perplexity ``exp(-avg)``.  Docs with fewer than 2 tokens are omitted.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    )
    v = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    ).collect()[0]["v"]
    bg = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    lq = (
        F.floor(
            F.log(
                (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(float(v)))
            )
            .cast("float")
            .cast("double")
            * F.lit(float(_Q))
        )
        .cast("long")
        .alias("lq")
    )
    scored = bg.join(c12, ["w1", "w2"]).join(c1, ["w1"]).select("doc_id", lq)
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("lq").cast("bigint").alias("logprob_q"),
    )
