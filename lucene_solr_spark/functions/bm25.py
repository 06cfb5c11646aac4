"""BM25 scoring kernel, float32-exact to the reference implementation.

Semantics pinned to ``reference lucene/core/src/java/org/apache/lucene/
search/similarities/BM25Similarity.java``:

- ``idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``
  (double math, cast to float32) — ``BM25Similarity.java:70-72``;
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)`` — ``:80-82``;
- per-norm cache ``cache[i] = k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)``
  evaluated in float32 — ``:188-192``;
- ``weight = boost * idf`` in float32 (NO (k1+1) numerator in this version)
  — ``:219``;
- ``score = weight * (float)(freq / (freq + (double) cache[norm]))`` —
  ``:222-226``;
- defaults ``k1 = 1.2, b = 0.75`` — ``:65-67``.

Tiebreak contract for top-k: score desc, docID asc
(``reference lucene/core/src/java/org/apache/lucene/search/HitQueue.java:76-80``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["BM25", "idf", "norm_cache", "score_blocks"]

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def idf(doc_freq, doc_count) -> np.float32:
    """float32 idf of a term. BM25Similarity.java:70-72."""
    df = np.float64(doc_freq)
    dc = np.float64(doc_count)
    return np.float32(np.log(1.0 + (dc - df + 0.5) / (df + 0.5)))


def avg_field_length(sum_total_term_freq, doc_count) -> np.float32:
    """float32 avgdl. BM25Similarity.java:80-82."""
    return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_cache(avgdl: np.float32, k1: float = DEFAULT_K1, b: float = DEFAULT_B) -> np.ndarray:
    """256-entry float32 cache: k1 * ((1-b) + b * decoded_len / avgdl).

    All-float32 arithmetic as in BM25Similarity.java:188-192 (every operand
    there is a Java float).
    """
    k1f = np.float32(k1)
    bf = np.float32(b)
    one = np.float32(1.0)
    return (k1f * ((one - bf) + (bf * LENGTH_TABLE) / np.float32(avgdl))).astype(np.float32)


def score_tf_norm(tfs: np.ndarray, norm_bytes: np.ndarray, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """Vectorized BM25Scorer.score (BM25Similarity.java:222-226).

    freq and the cached norm are promoted to double for the division, the
    quotient is cast to float32, then multiplied by the float32 weight.
    """
    norm = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(np.float64)
    freq = np.asarray(tfs, dtype=np.float64)
    t = (freq / (freq + norm)).astype(np.float32)
    return (np.float32(weight) * t).astype(np.float32)


@dataclass(frozen=True)
class BM25:
    """Per-(query-term) scorer with bound collection stats.

    The analog of ``BM25Similarity.scorer(boost, collectionStats, termStats)``
    (BM25Similarity.java:184-193): stats are bound once, globally, before any
    partition work — mirroring Lucene's global TermStates/CollectionStatistics
    resolution (``search/IndexSearcher.java:772,788``).
    """

    doc_count: int
    avgdl: np.float32
    k1: float = DEFAULT_K1
    b: float = DEFAULT_B
    boost: float = 1.0

    def weight(self, doc_freq: int) -> np.float32:
        return np.float32(np.float32(self.boost) * idf(doc_freq, self.doc_count))

    def cache(self) -> np.ndarray:
        return norm_cache(self.avgdl, self.k1, self.b)

    def max_block_score(self, max_tf, min_norm, doc_freq: int) -> np.ndarray:
        """Upper bound of the score of any posting in a block.

        (max_tf, min_norm) is a conservative pairing of the block's
        competitive impacts (CompetitiveImpactAccumulator.java:66-74): the
        true pareto set can be tighter, but this is always an upper bound
        because score is monotone up in tf and down in decoded length.
        """
        return score_tf_norm(np.asarray(max_tf), np.asarray(min_norm), self.weight(doc_freq), self.cache())

    def score(self, tfs, norm_bytes, doc_freq: int) -> np.ndarray:
        return score_tf_norm(tfs, norm_bytes, self.weight(doc_freq), self.cache())
