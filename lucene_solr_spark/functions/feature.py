"""FeatureField static-ranking features (reference ``lucene/core/src/java/
org/apache/lucene/document/FeatureField.java``).

The reference stores a per-doc feature value in the term-frequency slot,
quantized by dropping the low 15 mantissa bits of its float32 encoding
(``:153-154`` ``floatToIntBits(v) >>> 15``; decode ``:199-209`` — 9
significant bits survive), then scores with one of three monotone shapes:

- **saturation** (``:300-322``): ``w * (1 - p/(f+p))`` — every op float32;
- **log** (``:243-256``): ``f32(w * ln(scalingFactor +f32 f))`` — the add in
  float32, ln/mult in double;
- **sigmoid** (``:337-386``): ``f32(w * (1 - p^a/(f^a + p^a)))`` in double.

Vectorized numpy kernels; the searcher wraps them in one Arrow pandas UDF
over the corpus column (a feature is an ordinary column in our data model —
Lucene needs the freq-slot trick only because its postings are the sole
per-doc storage).
"""

from __future__ import annotations

import numpy as np

__all__ = ["quantize_feature", "feature_score"]


def quantize_feature(v: np.ndarray) -> np.ndarray:
    """Drop the low 15 mantissa bits of the float32 encoding (positive,
    finite inputs — FeatureField rejects others at index time)."""
    bits = np.ascontiguousarray(v, dtype=np.float32).view(np.uint32)
    return (bits & np.uint32(0xFFFF8000)).view(np.float32)


def feature_score(
    v: np.ndarray,
    function: str = "saturation",
    weight: float = 1.0,
    pivot: float = 1.0,
    scaling: float = 1.0,
    exponent: float = 1.0,
) -> np.ndarray:
    """float32 scores for quantized feature values, reference float chains."""
    f = quantize_feature(v)
    w32 = np.float32(weight)
    if function == "saturation":
        p32 = np.float32(pivot)
        t = np.float32(1.0) - (p32 / (f + p32)).astype(np.float32)
        return (w32 * t.astype(np.float32)).astype(np.float32)
    if function == "log":
        s32 = np.float32(scaling)
        return (float(weight) * np.log((s32 + f).astype(np.float32).astype(np.float64))).astype(
            np.float32
        )
    if function == "sigmoid":
        pa = float(pivot) ** float(exponent)
        fa = np.power(f.astype(np.float64), float(exponent))
        return (float(weight) * (1.0 - pa / (fa + pa))).astype(np.float32)
    raise ValueError(f"unknown feature function: {function}")
