"""BM25FQuery: multi-field blended-statistics term scoring.

Re-expression of the reference sandbox query
``reference lucene/sandbox/src/java/org/apache/lucene/search/BM25FQuery.java``
+ ``MultiNormsLeafSimScorer.java``: several fields are scored as one pseudo
field —

- pseudo term stats (``BM25FQuery.java:249-266``): ``docFreq = max`` over the
  per-(field, term) docFreqs, ``totalTermFreq`` accumulated as
  ``long += (double) fieldWeight * ttf`` (compound-assignment truncation per
  step — exact when the weights are integral, which this engine requires for
  order-free float determinism);
- pseudo collection stats (``mergeCollectionStatistics``,
  ``BM25FQuery.java:272-287``): ``docCount = max``, ``sumDocFreq = max`` over
  fields, ``sumTotalTermFreq`` accumulated the same truncating way; the BM25
  ``avgdl`` follows as ``(float)(sumTotalTermFreq / docCount)``;
- per-doc freq (``WeightedDisiWrapper.freq``, ``BM25FQuery.java:374-385``):
  ``sum of fieldWeight * tf`` over every matching (field, term) postings enum;
- per-doc norm (``MultiNormsLeafSimScorer.MultiFieldNormValues.longValue``):
  ``normValue = sum of fieldWeight * LENGTH_TABLE[norm_byte_field]`` (float
  accumulation), re-quantized ``SmallFloat.intToByte4(Math.round(normValue))``
  and decoded through the regular BM25 cache;
- single present (field, term) pair degenerates to a plain ``TermScorer``
  over that field's own norms with the *pseudo* weight
  (``BM25FQuery.java:342-351``).

Spark plan: one postings scan per field (pruned to the query terms), a
``doc_id`` union + sum for the weighted freq, one broadcast-free equi-join
per field against that field's norms column, and a vectorized Arrow kernel
for the re-quantized blended score. At 10^12-doc scale every stage shuffles
on ``doc_id`` only (co-partitioned by construction), never on raw text.

Float-exactness contract: field weights must be non-negative integers
(Lucene requires ``weight >= 1``); then every float accumulation above sums
integer-valued float32 terms and is order-independent, so scores are
bit-identical to the reference regardless of Java's HashMap field order or
Spark's union order.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import bm25
from ..functions.codec import unpack_blocks
from ..functions.smallfloat import LENGTH_TABLE, int_to_byte4
from .indexer import InvertedIndex

__all__ = ["bm25f_topk"]


def _unpack_postings(index: InvertedIndex, terms: Sequence[str]) -> DataFrame:
    """(term, doc_id, tf) for the given terms — bulk block decode, no scoring."""
    codec = index.config.codec
    blocks = index.postings.filter(F.col("term").isin(list(terms)))

    def fn(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            counts = pdf["count"].to_numpy(dtype=np.int64)
            doc_ids, tfs, _norms, _ = unpack_blocks(
                pdf["doc_id_base"].to_numpy(dtype=np.int64),
                counts,
                list(pdf["doc_ids"]),
                list(pdf["tfs"]),
                list(pdf["norms"]),
                codec=codec,
            )
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(dtype=object), counts),
                    "doc_id": doc_ids,
                    "tf": tfs.astype(np.int32),
                }
            )
        from lucene_solr_spark.memutil import trim_task_memory

        trim_task_memory()

    return blocks.mapInPandas(fn, schema="term string, doc_id bigint, tf int")


def _field_stats(index: InvertedIndex, terms: Sequence[str]) -> Dict[str, Tuple[int, int]]:
    rows = index.terms.filter(F.col("term").isin(list(terms))).collect()
    return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}


def bm25f_topk(
    fields: Sequence[Tuple[str, InvertedIndex, float]],
    terms: Sequence[str],
    k: int = 10,
    boost: float = 1.0,
) -> DataFrame:
    """Top-k ``(doc_id, score)`` of a BM25F query.

    ``fields``: ordered ``(name, index, weight)`` triples — each index is a
    separate :class:`InvertedIndex` built over that field's text (the analog
    of Lucene's per-field postings/norms under one reader). ``terms``: the
    shared term set (``BM25FQuery.Builder.addTerm``). Weights must be >= 1
    (``BM25FQuery.java:97-99``) and integral for bit-exactness (see module
    docstring).
    """
    terms = list(dict.fromkeys(terms))  # termsSet semantics: dedupe
    if not fields or not terms:
        raise ValueError("bm25f_topk needs at least one field and one term")
    for _, _, w in fields:
        if w < 1:
            raise ValueError("weight must be greater or equal to 1")  # BM25FQuery.java:97

    spark = fields[0][1].postings.sparkSession
    stats = [(name, idx, float(w), _field_stats(idx, terms)) for name, idx, w in fields]

    # ---- pseudo term statistics (BM25FQuery.java:249-266)
    doc_freq = 0
    total_ttf = 0
    present_pairs = []  # (name, idx, weight, present_terms)
    for name, idx, w, st in stats:
        present = [t for t in terms if t in st]
        if present:
            present_pairs.append((name, idx, w, present))
        for t in present:
            df_t, ttf_t = st[t]
            doc_freq = max(doc_freq, df_t)
            total_ttf = int(total_ttf + w * ttf_t)  # long += (double) w * ttf
    if doc_freq == 0:
        return spark.createDataFrame([], "doc_id bigint, score float")
    total_ttf = max(1, total_ttf)

    # ---- pseudo collection statistics (mergeCollectionStatistics, :272-287)
    doc_count = max(idx.doc_count for _, idx, _, _ in stats)
    sum_ttf = 0
    for _, idx, w, _ in stats:
        sum_ttf = int(sum_ttf + w * idx.sum_ttf)
    avgdl = bm25.avg_field_length(sum_ttf, max(doc_count, 1))
    weight = np.float32(np.float32(boost) * bm25.idf(doc_freq, doc_count))
    cache = bm25.norm_cache(avgdl)

    n_pairs = sum(len(p) for _, _, _, p in present_pairs)
    if n_pairs == 1:
        # TermScorer fallback (BM25FQuery.java:342-351): raw tf, that single
        # field's own norms, but the pseudo-stats weight.
        name, idx, w, present = present_pairs[0]
        up = _unpack_postings(idx, present)
        norms = idx.docs.select("doc_id", F.col("norm_byte").alias("nb"))
        joined = up.join(norms, "doc_id")

        @F.pandas_udf(T.FloatType())
        def term_score(tf: pd.Series, nb: pd.Series) -> pd.Series:
            return pd.Series(
                bm25.score_tf_norm(tf.to_numpy(dtype=np.int64), nb.to_numpy(dtype=np.int64), weight, cache)
            )

        scored = joined.select("doc_id", term_score("tf", "nb").alias("score"))
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ---- weighted freq: sum of w_f * tf over matching (field, term) enums
    parts = []
    for name, idx, w, present in present_pairs:
        up = _unpack_postings(idx, present)
        parts.append(
            up.groupBy("doc_id").agg((F.sum("tf") * F.lit(w)).cast("double").alias("wtf"))
        )
    matched = parts[0]
    for p in parts[1:]:
        matched = matched.unionByName(p)
    matched = matched.groupBy("doc_id").agg(F.sum("wtf").alias("freq"))

    # ---- norms of every *active* field joined in (deduped by field name,
    # MultiNormsLeafSimScorer.java:56-66); docs the field never saw decode
    # to length 0 (norm byte 0)
    active = []
    seen = set()
    for name, idx, w, _ in present_pairs:
        if name in seen:
            continue
        seen.add(name)
        active.append((name, w))
        col = f"_nb_{name}"
        matched = matched.join(
            idx.docs.select("doc_id", F.col("norm_byte").alias(col)), "doc_id", "left"
        ).withColumn(col, F.coalesce(F.col(col), F.lit(0)))

    weights_arr = np.asarray([w for _, w in active], dtype=np.float32)
    norm_cols = [f"_nb_{name}" for name, _ in active]

    @F.pandas_udf(T.FloatType())
    def blended_score(*cols: pd.Series) -> pd.Series:
        freq = cols[0].to_numpy(dtype=np.float64)
        norm_value = np.zeros(len(freq), dtype=np.float32)
        for i, c in enumerate(cols[1:]):
            nb = c.to_numpy(dtype=np.int64) & 0xFF
            norm_value = norm_value + weights_arr[i] * LENGTH_TABLE[nb]
        # SmallFloat.intToByte4(Math.round(normValue)) — Java round-half-up
        blended_byte = int_to_byte4(np.floor(norm_value.astype(np.float64) + 0.5).astype(np.int64))
        norm = cache[blended_byte].astype(np.float64)
        t32 = (freq / (freq + norm)).astype(np.float32)
        return pd.Series((weight * t32).astype(np.float32))

    scored = matched.select("doc_id", blended_score("freq", *norm_cols).alias("score"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
