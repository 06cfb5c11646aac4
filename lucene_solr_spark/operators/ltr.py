"""Learning-to-rank rescoring — Solr LTR contrib re-expressed Spark-first.

Reference: ``solr/contrib/ltr/src/java/org/apache/solr/ltr/``:

- ``model/LinearModel.java:117-123`` — dot product accumulated in float32;
- ``model/MultipleAdditiveTreesModel.java:124-183,271-272,336-341`` — sum of
  ``weight * tree(features)`` where each node routes ``feature <= threshold``
  left / else right, with ``NODE_SPLIT_SLACK = 1E-6f`` added to every
  threshold at parse time (:124,150-156);
- ``feature/{Value,FieldValue,FieldLength,OriginalScore,Solr}Feature.java`` —
  the feature zoo (FieldLengthFeature decodes the single-byte norm through
  ``SmallFloat.byte4ToInt``, :74-90);
- ``norm/{Identity,MinMax,Standard}Normalizer.java`` — per-feature float32
  normalization applied before the model (``MinMax: (v-min)/delta``,
  ``Standard: (v-avg)/std``);
- ``LTRRescorer.java:102-141`` — rescore the first-pass top-N, then sort by
  (model score desc, docID asc).

Spark-first shape: the candidate set is the k-row first-pass top-N, so every
feature is a Column over a k-row DataFrame (broadcast-join territory at any
scale) and both models compile to pure Catalyst expressions — nested float32
arithmetic for LinearModel, nested CASE WHEN for the additive trees — that
whole-stage-codegen evaluates with zero Python on the scoring path.  The one
exception is FieldLengthFeature, which re-analyzes the k candidate rows in a
single Arrow batch (the same k-row post-pass as term_vectors) because the
engine deliberately stores norms only inside posting blocks.

At 100 TB nothing here touches the corpus beyond the k candidate rows: the
first pass bounds all feature extraction, exactly like the reference's
reRankDocs window.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.smallfloat import int_to_byte4, byte4_to_int


def _f32(x: float) -> float:
    """Python float holding the exact float32 value (Java float literal)."""
    return float(np.float32(x))


def _lit32(x: float) -> Column:
    return F.lit(_f32(x)).cast("float")


# --------------------------------------------------------------- normalizers
@dataclass(frozen=True)
class IdentityNormalizer:
    """norm/IdentityNormalizer.java — value passes through."""

    def column(self, c: Column) -> Column:
        return c

    def sql(self, e: str) -> str:
        return e


@dataclass(frozen=True)
class MinMaxNormalizer:
    """norm/MinMaxNormalizer.java:86-88 — ``(value - min) / delta`` in float32
    with ``delta = max - min`` precomputed as a float."""

    min: float
    max: float

    @property
    def delta(self) -> float:
        return _f32(np.float32(self.max) - np.float32(self.min))

    def column(self, c: Column) -> Column:
        return ((c - _lit32(self.min)).cast("float") / _lit32(self.delta)).cast("float")

    def sql(self, e: str) -> str:
        return (
            f"CAST(CAST(({e}) - CAST({_f32(self.min)!r} AS REAL) AS REAL)"
            f" / CAST({self.delta!r} AS REAL) AS REAL)"
        )


@dataclass(frozen=True)
class StandardNormalizer:
    """norm/StandardNormalizer.java:69-71 — ``(value - avg) / std`` float32."""

    avg: float
    std: float

    def column(self, c: Column) -> Column:
        return ((c - _lit32(self.avg)).cast("float") / _lit32(self.std)).cast("float")

    def sql(self, e: str) -> str:
        return (
            f"CAST(CAST(({e}) - CAST({_f32(self.avg)!r} AS REAL) AS REAL)"
            f" / CAST({_f32(self.std)!r} AS REAL) AS REAL)"
        )


# ------------------------------------------------------------------ features
@dataclass(frozen=True)
class Feature:
    name: str
    norm: object = field(default_factory=IdentityNormalizer)


@dataclass(frozen=True)
class ValueFeature(Feature):
    """feature/ValueFeature.java — constant float value."""

    value: float = 0.0


@dataclass(frozen=True)
class FieldValueFeature(Feature):
    """feature/FieldValueFeature.java — numeric stored-field value as float;
    documents missing the field score the default 0."""

    field: str = ""


@dataclass(frozen=True)
class FieldLengthFeature(Feature):
    """feature/FieldLengthFeature.java:74-90 — field length in terms, decoded
    from the 1-byte norm: ``byte4ToInt(intToByte4(dl))``."""


@dataclass(frozen=True)
class OriginalScoreFeature(Feature):
    """feature/OriginalScoreFeature.java — the first-pass query score."""


@dataclass(frozen=True)
class QueryFeature(Feature):
    """feature/SolrFeature.java analog — the float32 score of another engine
    query on the candidate doc (0 / ``default`` when the query misses it)."""

    query: object = None
    default: float = 0.0


# -------------------------------------------------------------------- models
@dataclass(frozen=True)
class TreeNode:
    """model/MultipleAdditiveTreesModel.java:124-183.  Leaf iff ``left`` is
    None.  ``threshold`` is stored WITH the +1E-6f slack already applied, as
    the reference does at parse time (:150-156)."""

    value: float = 0.0
    feature: Optional[str] = None
    threshold: float = 0.0
    left: Optional["TreeNode"] = None
    right: Optional["TreeNode"] = None

    @staticmethod
    def split(feature: str, threshold: float, left: "TreeNode", right: "TreeNode") -> "TreeNode":
        slacked = _f32(np.float32(threshold) + np.float32(1e-6))
        return TreeNode(feature=feature, threshold=slacked, left=left, right=right)

    @staticmethod
    def leaf(value: float) -> "TreeNode":
        return TreeNode(value=_f32(value))

    def column(self, cols: dict) -> Column:
        if self.left is None:
            return _lit32(self.value)
        return (
            F.when(cols[self.feature] <= _lit32(self.threshold), self.left.column(cols))
            .otherwise(self.right.column(cols))
            .cast("float")
        )

    def sql(self, exprs: dict) -> str:
        if self.left is None:
            return f"CAST({self.value!r} AS REAL)"
        return (
            f"CASE WHEN ({exprs[self.feature]}) <= CAST({self.threshold!r} AS REAL) "
            f"THEN {self.left.sql(exprs)} ELSE {self.right.sql(exprs)} END"
        )


@dataclass(frozen=True)
class LinearModel:
    """model/LinearModel.java:117-123 — ``score += normed[i] * weight[i]``,
    one float32 multiply + one float32 add per feature, in feature order."""

    features: tuple
    weights: dict

    def column(self, cols: dict) -> Column:
        acc: Optional[Column] = None
        for f in self.features:
            term = (cols[f.name] * _lit32(self.weights[f.name])).cast("float")
            acc = term if acc is None else (acc + term).cast("float")
        return acc if acc is not None else _lit32(0.0)

    def sql(self, exprs: dict) -> str:
        acc = None
        for f in self.features:
            t = f"CAST(({exprs[f.name]}) * CAST({_f32(self.weights[f.name])!r} AS REAL) AS REAL)"
            acc = t if acc is None else f"CAST({acc} + {t} AS REAL)"
        return acc or "CAST(0.0 AS REAL)"


@dataclass(frozen=True)
class MultipleAdditiveTreesModel:
    """model/MultipleAdditiveTreesModel.java:271-272,336-341 —
    ``score += weight * tree(features)`` accumulated in float32."""

    features: tuple
    trees: tuple  # of (weight, TreeNode)

    def column(self, cols: dict) -> Column:
        acc: Optional[Column] = None
        for w, root in self.trees:
            t = (_lit32(w) * root.column(cols)).cast("float")
            acc = t if acc is None else (acc + t).cast("float")
        return acc if acc is not None else _lit32(0.0)

    def sql(self, exprs: dict) -> str:
        acc = None
        for w, root in self.trees:
            t = f"CAST(CAST({_f32(w)!r} AS REAL) * ({root.sql(exprs)}) AS REAL)"
            acc = t if acc is None else f"CAST({acc} + {t} AS REAL)"
        return acc or "CAST(0.0 AS REAL)"


# ------------------------------------------------------------------ rescorer
def _field_length_df(searcher, cand: DataFrame) -> DataFrame:
    """k-row re-analysis → byte4-quantized length (= the norm-decoded value
    the reference feature sees), one Arrow batch."""
    id_col, text_col = searcher.index.config.id_col, searcher.index.config.text_col
    analyzer = searcher.index.config.analyzer
    keys = cand.select(F.col("doc_id").alias("_cand_id"))
    rows = searcher.corpus.join(
        F.broadcast(keys), F.col(id_col) == F.col("_cand_id"), "left_semi"
    ).select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("_text"))

    def lens(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            _flat, _rid, dl = analyzer.analyze_batch(pdf["_text"])
            dec = byte4_to_int(int_to_byte4(np.asarray(dl, dtype=np.int64)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "_dlq": dec.astype(np.float32)}
            )

    return rows.mapInPandas(lens, schema="doc_id long, _dlq float")


def ltr_rescore(searcher, top, model, k: Optional[int] = None) -> DataFrame:
    """LTRRescorer.rescore (``LTRRescorer.java:102-141``): extract features
    for the first-pass top-N, score the model, sort (model score desc, doc_id
    asc), keep ``k`` (defaults to all reranked docs).

    Returns ``(doc_id, score, first_pass_score)``.
    """
    cand = top.df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("float").alias("first_pass_score"),
    )

    cols: dict = {}
    df = cand
    for f in model.features:
        if isinstance(f, OriginalScoreFeature):
            raw = F.col("first_pass_score")
        elif isinstance(f, ValueFeature):
            raw = _lit32(f.value)
        elif isinstance(f, FieldValueFeature):
            id_col = searcher.index.config.id_col
            side = searcher.corpus.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.coalesce(F.col(f.field).cast("float"), _lit32(0.0)).alias(f"_fv_{f.name}"),
            )
            df = df.join(side, "doc_id", "left")
            raw = F.coalesce(F.col(f"_fv_{f.name}"), _lit32(0.0))
        elif isinstance(f, FieldLengthFeature):
            side = _field_length_df(searcher, cand)
            df = df.join(F.broadcast(side), "doc_id", "left")
            raw = F.coalesce(F.col("_dlq"), _lit32(0.0))
        elif isinstance(f, QueryFeature):
            stats = searcher._term_stats(f.query.terms())
            side = searcher._evaluate(f.query, 1.0, stats).select(
                "doc_id", F.col("score").alias(f"_q_{f.name}")
            )
            df = df.join(F.broadcast(side), "doc_id", "left")
            raw = F.coalesce(F.col(f"_q_{f.name}").cast("float"), _lit32(f.default))
        else:  # pragma: no cover
            raise ValueError(f"unknown feature {f}")
        cols[f.name] = f.norm.column(raw.cast("float"))

    scored = df.select(
        "doc_id", model.column(cols).alias("score"), "first_pass_score"
    ).orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.limit(int(k)) if k is not None else scored
