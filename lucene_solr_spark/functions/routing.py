"""Document routing — Solr ``CompositeIdRouter`` analog.

Reference semantics (``solr/solrj/src/java/org/apache/solr/common/cloud/
CompositeIdRouter.java``, ``HashBasedRouter.java``, ``common/util/Hash.java:
242-297``):

- plain ids hash with murmur3_x86_32 (seed 0) over the UTF-8 bytes;
- composite ids ``shardKey!id`` combine ``hash(shardKey)``'s top 16 bits
  with ``hash(id)``'s bottom 16 (KeyParser :189-249, getBitMasks :288-295);
  ``shardKey/b!id`` overrides the split point to ``b`` bits; a tri-level
  ``a!b!c`` uses 8+8 bits by default; a trailing ``!`` hashes the empty
  string for the remaining piece;
- the collection's hash ring is the full signed-int32 range split into
  contiguous shard ranges (``DocRouter.partitionRange``).

Spark surface: :func:`route` adds the shard id as a column via a vectorized
batch UDF (hashing the batch's *unique* ids only — route keys repeat heavily
in transcript corpora) so ``df.repartition(n, "shard")`` reproduces the
reference's placement exactly.  The murmur here is bit-exact with the
reference (tested against the reference Java implementation's published
vectors), NOT Spark's built-in ``F.hash`` (murmur3 with seed 42 and a
different layout for strings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["murmur3_x86_32", "composite_id_hash", "shard_ranges", "shard_of", "route"]

_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def murmur3_x86_32(data, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Hash.java:242-297) over UTF-8 bytes; returns
    a SIGNED int32 like the reference."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & _MASK32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k1 = (k1 * c1) & _MASK32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & _MASK32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    k1 = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & _MASK32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & _MASK32
        h1 ^= k1
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _bit_masks(first_bits: int, second_bits: int | None = None) -> list:
    """CompositeIdRouter.getBitMasks (:288-302), in signed-int32 space."""

    def neg_shift(bits):  # (-1 << (32 - bits)) as signed int32
        if bits == 0:
            return 0
        v = (-1 << (32 - bits)) & _MASK32
        return v - (1 << 32) if v >= (1 << 31) else v

    if second_bits is None:
        m0 = neg_shift(first_bits)
        m1 = ~m0 & _MASK32
        m1 = m1 - (1 << 32) if m1 >= (1 << 31) else m1
        return [m0, m1]
    m0 = neg_shift(first_bits)
    m1 = (m0 ^ neg_shift(first_bits + second_bits)) & _MASK32
    m1 = m1 - (1 << 32) if m1 >= (1 << 31) else m1
    if first_bits + second_bits == 32:
        m2 = 0
    else:
        m2 = ~(m0 | m1) & _MASK32
        m2 = m2 - (1 << 32) if m2 >= (1 << 31) else m2
    return [m0, m1, m2]


def composite_id_hash(key: str) -> int:
    """CompositeIdRouter.sliceHash / KeyParser.getHash (:45-58,181-340)."""
    sep = "!"
    first = key.find(sep)
    if first == -1:
        return murmur3_x86_32(key)
    parts = [key[:first]]
    last_pos = len(key) - 1
    if first < last_pos:
        second = key.find(sep, first + 1)
        if second == -1:
            parts.append(key[first + 1 :])
        elif second == last_pos:
            # SOLR-6257: two separators as the final two chars
            if first < second - 1:
                parts.append(key[first + 1 : second])
        else:
            parts.append(key[first + 1 : second])
            parts.append(key[second + 1 :])
    pieces = len(parts)
    if key.endswith(sep) and pieces < 3:
        pieces += 1
    tri = pieces == 3
    num_bits = [8, 8] if tri else [16, 0]
    hashes = []
    for i in range(pieces):
        part = parts[i] if i < len(parts) else ""
        if i < pieces - 1:
            comma = part.find("/")
            if comma > 0:
                num_bits[i] = int(part[comma + 1 :])
                part = part[:comma]
        hashes.append(murmur3_x86_32(part))
    masks = _bit_masks(num_bits[0], num_bits[1]) if tri else _bit_masks(num_bits[0])
    result = hashes[0] & masks[0]
    for i in range(1, pieces):
        result |= hashes[i] & masks[i]
    result &= _MASK32
    return result - (1 << 32) if result >= (1 << 31) else result


def shard_ranges(n_shards: int) -> list:
    """DocRouter.partitionRange over the full signed-int32 ring: n contiguous
    [lower, upper] ranges covering MIN_INT..MAX_INT."""
    lo, hi = -(1 << 31), (1 << 31) - 1
    total = (1 << 32)
    step = total // n_shards
    out = []
    start = lo
    for i in range(n_shards):
        end = hi if i == n_shards - 1 else start + step - 1
        out.append((start, end))
        start = end + 1
    return out


def shard_of(hash32: int, n_shards: int) -> int:
    step = (1 << 32) // n_shards
    idx = (hash32 + (1 << 31)) // step
    return min(idx, n_shards - 1)


def route(df, id_col: str, n_shards: int, out_col: str = "shard"):
    """Add the reference-exact shard id for each row's route key.  Batch UDF
    hashing only the unique keys per Arrow batch (route keys repeat)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _route(ids: pd.Series) -> pd.Series:
        codes, uniques = pd.factorize(ids, sort=False)
        mapped = np.array([shard_of(composite_id_hash(u), n_shards) for u in uniques], dtype=np.int32)
        return pd.Series(mapped[codes])

    return df.withColumn(out_col, _route(F.col(id_col)))
