"""Lossy small-int/float encodings used for document-length norms.

Semantics match ``reference lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:101-169`` (``longToInt4`` / ``int4ToLong`` /
``intToByte4`` / ``byte4ToInt``): a float-like order-preserving encoding of a
positive int into one byte, exact below ``NUM_FREE_VALUES`` and keeping 4
significant bits above it.  BM25 norms are ``intToByte4(field_length)``
(``BM25Similarity.java:116-126``) and are decoded at query time through a
256-entry table (``BM25Similarity.java:106-112``).

All functions are vectorized numpy; scalar ints also work.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "long_to_int4",
    "int4_to_long",
    "NUM_FREE_VALUES",
    "LENGTH_TABLE",
]


def _bit_length(i: np.ndarray) -> np.ndarray:
    """Exact number of significant bits per element (0 for 0)."""
    nb = np.zeros_like(i)
    nz = i > 0
    x = i[nz]
    cand = np.floor(np.log2(x.astype(np.float64))).astype(np.int64) + 1
    # float log2 can misround at power-of-two boundaries; correct exactly
    cand = np.where((np.int64(1) << np.maximum(cand - 1, 0)) > x, cand - 1, cand)
    cand = np.where((np.int64(1) << np.minimum(cand, 62)) <= x, cand + 1, cand)
    nb[nz] = cand
    return nb


def long_to_int4(i):
    """Order-preserving 4-significant-bit encoding of non-negative ints."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    num_bits = _bit_length(i)
    shift = num_bits - 4
    normal = num_bits >= 4
    encoded = np.where(normal, ((i >> np.maximum(shift, 0)) & 0x07) | ((shift + 1) << 3), i)
    return encoded.astype(np.int64)


def int4_to_long(i):
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0)).astype(np.int64)


_MAX_INT4 = int(long_to_int4(np.int64(2**31 - 1)))
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24 with 4-bit encoding


def int_to_byte4(i):
    """Encode non-negative int(s) to a single byte (uint8)."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    out = np.where(i < NUM_FREE_VALUES, i, NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0)))
    return out.astype(np.uint8)


def byte4_to_int(b):
    """Decode byte(s) produced by :func:`int_to_byte4` (input uint8 / int)."""
    i = np.asarray(b, dtype=np.int64) & 0xFF
    return np.where(i < NUM_FREE_VALUES, i, NUM_FREE_VALUES + int4_to_long(np.maximum(i - NUM_FREE_VALUES, 0))).astype(
        np.int64
    )


# Decoded length per norm byte, float32 — BM25Similarity.java:106-112
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
