"""Per-run term Bloom filters — BloomFilteringPostingsFormat re-expressed.

Reference: ``lucene/codecs/src/java/org/apache/lucene/codecs/bloom/``:

- ``FuzzySet.java:84-95`` — bitset sizes are all-ones binary numbers
  (3, 7, 15, …) so ``hash & bloomSize`` is the modulo; ``:215-241`` —
  membership is ONE hash probe: ``hash < 0 -> hash * -1``, ``pos = hash &
  bloomSize``, bit test; ``:294-301`` — sizing estimate
  ``setSize · -ln(1 - saturation)``;
- ``MurmurHash2.java:41-95`` — 32-bit MurmurHash2 with seed ``0x9747b28c``,
  adapted to byte arrays (the top tail byte is SIGNED, the rest masked);
- ``BloomFilteringPostingsFormat.java`` — one FuzzySet per (field, segment),
  consulted by ``seekExact`` to reject terms absent from a segment without
  touching the term dictionary;
- ``DefaultBloomFilterFactory.java:29-39`` — sized for ~10 % saturation,
  dropped when > 90 % saturated.

Spark-first shape: one bloom row per posting run ``(run_id, bloom_size,
n_terms, bits)`` — a table with as many rows as runs, megabytes total at any
corpus scale.  Query-time pruning is a job over THIS table, never the
postings: hash the query terms on the driver, test each run's bitmap in one
Arrow pass, and return the surviving run_ids; the postings scan then adds a
``run_id IN (...)`` predicate next to the term predicate, so parquet
row-groups of runs that provably lack every query term are never read.  This
complements term-sorted min/max pruning exactly as the reference's bloom
complements the block-tree: it rejects terms that fall INSIDE a run's
[min,max] range but are absent (the primary-key / rare-term lookup case).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "murmurhash2",
    "positive_hash",
    "nearest_set_size",
    "build_term_blooms",
    "may_contain",
    "prune_run_ids",
    "rejected_run_ids",
]

_SEED = 0x9747B28C  # MurmurHash2.hash32 (MurmurHash2.java:92-94)
_M = 0x5BD1E995
_MASK = 0xFFFFFFFF

# all-ones sizes 3, 7, 15, … 2^31-1 (FuzzySet.java:84-95)
USABLE_BIT_SET_SIZES = [(1 << (i + 2)) - 1 for i in range(30)]


def _i32(x: int) -> int:
    """Wrap to Java int (two's complement 32-bit, signed)."""
    x &= _MASK
    return x - (1 << 32) if x >= 1 << 31 else x


def murmurhash2(data: bytes, seed: int = _SEED) -> int:
    """Exact port of ``MurmurHash2.hash(byte[], seed, offset, len)``
    (MurmurHash2.java:41-79).  Java bytes are signed: the high tail byte of
    each 4-byte word is used UNmasked (``int k = data[i_4 + 3]``) and the
    <4-byte tail bytes likewise sign-extend — mirrored here."""
    ln = len(data)
    h = _i32(seed ^ ln)
    sgn = lambda b: b - 256 if b >= 128 else b  # noqa: E731 — signed byte
    n4 = ln >> 2
    for i in range(n4):
        o = i << 2
        k = sgn(data[o + 3])
        k = _i32((k << 8) | (data[o + 2] & 0xFF))
        k = _i32((k << 8) | (data[o + 1] & 0xFF))
        k = _i32((k << 8) | (data[o] & 0xFF))
        k = _i32(k * _M)
        k = _i32(k ^ ((k & _MASK) >> 24))
        k = _i32(k * _M)
        h = _i32(h * _M)
        h = _i32(h ^ k)
    left = ln - (n4 << 2)
    if left:
        if left >= 3:
            h = _i32(h ^ _i32(sgn(data[ln - 3]) << 16))
        if left >= 2:
            h = _i32(h ^ _i32(sgn(data[ln - 2]) << 8))
        if left >= 1:
            h = _i32(h ^ sgn(data[ln - 1]))
        h = _i32(h * _M)
    h = _i32(h ^ ((h & _MASK) >> 13))
    h = _i32(h * _M)
    h = _i32(h ^ ((h & _MASK) >> 15))
    return h


def positive_hash(h: int) -> int:
    """``if (hash < 0) hash = hash * -1`` (FuzzySet.java:234-237) in Java int
    arithmetic — Integer.MIN_VALUE stays negative, and the subsequent
    ``hash & bloomSize`` is a plain bitwise AND on the two's-complement bits
    either way; return the 32 bit pattern as an unsigned int so ``& size``
    behaves identically."""
    if h < 0:
        h = _i32(h * -1)
    return h & _MASK


def nearest_set_size(max_values: int, saturation: float = 0.10) -> int:
    """``FuzzySet.getNearestSetSize(maxNumberOfValuesExpected, saturation)``
    (FuzzySet.java:117-131): smallest all-ones size whose estimated unique
    capacity at the target saturation exceeds ``max_values``."""
    for size in USABLE_BIT_SET_SIZES:
        bits_at_sat = int(size * saturation)
        est = int(size * -np.log(1.0 - bits_at_sat / float(size)))
        if est > max_values:
            return size
    return USABLE_BIT_SET_SIZES[-1]


def _bit_positions(terms: Iterable[str], bloom_size: int) -> np.ndarray:
    return np.array(
        [positive_hash(murmurhash2(t.encode("utf-8"))) & bloom_size for t in terms],
        dtype=np.int64,
    )


def _pack(positions: np.ndarray, bloom_size: int) -> bytes:
    bits = np.zeros((bloom_size >> 3) + 1, dtype=np.uint8)
    np.bitwise_or.at(bits, positions >> 3, (1 << (positions & 7)).astype(np.uint8))
    return bits.tobytes()


def may_contain(bits: bytes, bloom_size: int, term: str) -> bool:
    """One hash probe (FuzzySet.mayContainValue, :215-227): MAYBE/NO."""
    pos = positive_hash(murmurhash2(term.encode("utf-8"))) & bloom_size
    return bool(bytearray(bits)[pos >> 3] & (1 << (pos & 7)))


def build_term_blooms(index, saturation: float = 0.10) -> DataFrame:
    """Build one FuzzySet per posting run: ``(run_id, bloom_size, n_terms,
    bits)``.  Sized per run from its ACTUAL distinct-term count (we know it
    exactly at build time — strictly better than DefaultBloomFilterFactory's
    maxDoc assumption, same sizing curve).  The only shuffle carries distinct
    (run_id, term) pairs; bitmaps are built in one Arrow pass per run."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for run_id, grp in pdf.groupby("run_id"):
            terms = grp["term"].to_numpy(dtype=object)
            size = nearest_set_size(len(terms), saturation)
            bits = _pack(_bit_positions(terms, size), size)
            out.append((int(run_id), int(size), len(terms), bits))
        return pd.DataFrame(out, columns=["run_id", "bloom_size", "n_terms", "bits"])

    pairs = index.postings.select("run_id", "term").distinct()
    return pairs.groupBy("run_id").applyInPandas(
        build, schema="run_id bigint, bloom_size int, n_terms bigint, bits binary"
    )


def prune_run_ids(blooms: DataFrame, terms: list) -> Optional[list]:
    """Runs that MAY contain at least one of ``terms``: hash the query terms
    once on the driver, probe every run's bitmap in one distributed Arrow
    pass over the (tiny) bloom table, and collect the surviving run_ids.
    Returns None when ``terms`` is empty (no pruning).

    NOTE: only runs PRESENT in ``blooms`` can pass — a run missing from the
    table is silently dropped by a ``run_id IN (passing)`` predicate.  Query
    paths must use :func:`rejected_run_ids` (fail-open for uncovered runs)
    unless they have asserted full coverage."""
    if not terms:
        return None
    rows = (
        blooms.where(_probe_any(terms)(F.col("bloom_size"), F.col("bits")))
        .select("run_id")
        .collect()
    )
    return [r["run_id"] for r in rows]


def rejected_run_ids(blooms: DataFrame, terms: list) -> list:
    """Runs whose bloom DEFINITIVELY rejects every query term (bloom NO is
    the only definitive answer — FuzzySet.java:215-241).  The caller excludes
    these with ``NOT run_id IN (rejected)``, which FAILS OPEN for runs absent
    from the bloom table (e.g. a bloom built before newer runs were flushed or
    merged): an uncovered run is never pruned, preserving set_term_blooms'
    "results are identical with or without" contract."""
    if not terms:
        return []
    rows = (
        blooms.where(~_probe_any(terms)(F.col("bloom_size"), F.col("bits")))
        .select("run_id")
        .collect()
    )
    return [r["run_id"] for r in rows]


def _probe_any(terms: list):
    """Pandas UDF: does ANY query-term hash hit this run's bitmap?"""
    hashes = [positive_hash(murmurhash2(t.encode("utf-8"))) for t in terms]

    @F.pandas_udf("boolean")
    def probe(size: pd.Series, bits: pd.Series) -> pd.Series:
        out = []
        for s, b in zip(size.to_numpy(), bits):
            ba = bytearray(b)
            hit = False
            for h in hashes:
                pos = h & int(s)
                if ba[pos >> 3] & (1 << (pos & 7)):
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out)

    return probe
