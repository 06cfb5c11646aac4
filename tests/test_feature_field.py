"""FeatureField quantization and scoring kernels."""

import struct

import numpy as np

from lucene_solr_spark.functions.feature import feature_score, quantize_feature


def _java_decode(v: float) -> float:
    """floatToIntBits(v) >>> 15, then intBitsToFloat(tf << 15) — the
    reference's encode/decode round trip (FeatureField.java:153-154,199-209)."""
    bits = struct.unpack(">I", struct.pack(">f", np.float32(v)))[0]
    return struct.unpack(">f", struct.pack(">I", (bits >> 15) << 15))[0]


def test_quantize_matches_java_roundtrip():
    vals = [0.0, 1.0, 1.5, 3.1415926, 255.0, 256.0, 257.0, 1000.5, 123456.78, 1e-20, 3e38]
    got = quantize_feature(np.array(vals, dtype=np.float64))
    for v, g in zip(vals, got):
        assert float(g) == _java_decode(v), v


def test_integer_features_keep_top9_bits():
    # for ints < 2^24 the float32 mantissa truncation == keep top 9 bits
    for n in [1, 2, 255, 256, 511, 512, 513, 1000, 4095, 4096, 65535, 1 << 20]:
        bl = n.bit_length()
        expect = n if bl <= 9 else (n >> (bl - 9)) << (bl - 9)
        assert float(quantize_feature(np.array([n], dtype=np.float64))[0]) == float(expect), n


def test_saturation_monotone_and_float32():
    v = np.array([1.0, 10.0, 100.0, 1000.0])
    s = feature_score(v, "saturation", weight=2.0, pivot=256.0)
    assert s.dtype == np.float32
    assert all(s[i] < s[i + 1] for i in range(len(s) - 1))
    # exact reference chain for one value: w*(1 - p/(f+p)) all f32
    f = np.float32(quantize_feature(np.array([1000.0]))[0])
    expect = np.float32(2.0) * np.float32(
        np.float32(1.0) - np.float32(np.float32(256.0) / np.float32(f + np.float32(256.0)))
    )
    assert s[3] == expect


def test_log_and_sigmoid_shapes():
    v = np.array([1.0, 10.0, 100.0])
    lg = feature_score(v, "log", weight=1.5, scaling=1.0)
    sg = feature_score(v, "sigmoid", weight=1.0, pivot=10.0, exponent=2.0)
    assert lg.dtype == sg.dtype == np.float32
    assert all(lg[i] < lg[i + 1] for i in range(2))
    assert all(sg[i] < sg[i + 1] for i in range(2))
    assert 0 < sg[1] < 1 and abs(float(sg[1]) - 0.5) < 1e-6  # f == pivot -> 0.5
