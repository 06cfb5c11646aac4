"""Unit tests for the pure-numpy kernels (no Spark needed).

Modeled on the reference's codec contract tests (SURVEY.md §5):
seeded-random round-trips for the codec (RandomPostingsTester analog),
table-driven checks for SmallFloat and BM25.
"""

import numpy as np
import pytest

from lucene_solr_spark.functions import analysis, bm25, codec, smallfloat


# ---------------------------------------------------------------- SmallFloat
def _java_long_to_int4(i: int) -> int:
    # independent scalar re-derivation of SmallFloat.longToInt4 semantics
    if i < 0:
        raise ValueError
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _java_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def test_num_free_values():
    assert smallfloat.NUM_FREE_VALUES == 255 - _java_long_to_int4(2**31 - 1)


@pytest.mark.parametrize("hi", [2**10, 2**20])
def test_long_to_int4_exhaustive_low(hi):
    vals = np.arange(hi, dtype=np.int64)
    got = smallfloat.long_to_int4(vals)
    exp = np.array([_java_long_to_int4(int(v)) for v in range(0, hi, max(1, hi // 5000))])
    idx = np.arange(0, hi, max(1, hi // 5000))
    assert np.array_equal(got[idx], exp)
    # exhaustive over the low range
    lo = min(hi, 4096)
    exp_full = np.array([_java_long_to_int4(v) for v in range(lo)])
    assert np.array_equal(got[:lo], exp_full)


def test_long_to_int4_log_sampled_high():
    rng = np.random.default_rng(42)
    vals = np.unique((2 ** (rng.uniform(0, 31, 20000))).astype(np.int64))
    got = smallfloat.long_to_int4(vals)
    exp = np.array([_java_long_to_int4(int(v)) for v in vals])
    assert np.array_equal(got, exp)


def test_byte4_roundtrip_properties():
    vals = np.arange(0, 100000, dtype=np.int64)
    enc = smallfloat.int_to_byte4(vals)
    dec = smallfloat.byte4_to_int(enc)
    # exact below NUM_FREE_VALUES + 16
    exact = vals < smallfloat.NUM_FREE_VALUES + 16
    assert np.array_equal(dec[exact], vals[exact])
    # decode(encode(x)) <= x, order preserving, idempotent
    assert np.all(dec <= vals)
    assert np.all(np.diff(dec) >= 0)
    assert np.array_equal(smallfloat.int_to_byte4(dec), enc)


def test_length_table():
    assert smallfloat.LENGTH_TABLE.dtype == np.float32
    assert smallfloat.LENGTH_TABLE[0] == 0.0
    for i in (0, 1, 23, 24, 100, 255):
        assert smallfloat.LENGTH_TABLE[i] == np.float32(smallfloat.byte4_to_int(np.uint8(i)))


# --------------------------------------------------------------------- codec
def test_varint_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31 - 1, 2**40], dtype=np.int64)
    assert np.array_equal(codec.decode_varint(codec.encode_varint(vals)), vals)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        mag = int(rng.integers(1, 40))
        vals = rng.integers(0, 2**mag, n, dtype=np.int64)
        assert np.array_equal(codec.decode_varint(codec.encode_varint(vals)), vals)


def test_varint_empty():
    assert codec.encode_varint(np.empty(0, np.int64)) == b""
    assert codec.decode_varint(b"").size == 0


def _random_postings(rng, n_terms, max_docs):
    rows = []
    for t in range(n_terms):
        n = int(rng.integers(1, max_docs))
        docs = np.sort(rng.choice(np.arange(max_docs * 3), size=n, replace=False))
        tfs = rng.integers(1, 50, n)
        norms = rng.integers(0, 256, n)
        rows.append((t, docs, tfs, norms))
    return rows


@pytest.mark.parametrize("block_size", [4, 128])
def test_pack_unpack_roundtrip(block_size):
    rng = np.random.default_rng(7)
    rows = _random_postings(rng, n_terms=37, max_docs=1000)
    term_codes = np.concatenate([np.full(len(d), t) for t, d, _, _ in rows])
    doc_ids = np.concatenate([d for _, d, _, _ in rows])
    tfs = np.concatenate([f for _, _, f, _ in rows])
    norms = np.concatenate([n for _, _, _, n in rows]).astype(np.uint8)

    packed = codec.pack_postings_blocks(term_codes, doc_ids, tfs, norms, block_size=block_size)
    # block invariants
    assert np.all(packed["count"] <= block_size)
    assert np.all(packed["count"] >= 1)

    got_docs, got_tfs, got_norms, blk = codec.unpack_blocks(
        packed["doc_id_base"], packed["count"], packed["doc_bytes"], packed["tf_bytes"], packed["norm_bytes"]
    )
    assert np.array_equal(got_docs, doc_ids)
    assert np.array_equal(got_tfs, tfs)
    assert np.array_equal(got_norms, norms)
    # per-block impacts correct
    starts = np.cumsum(packed["count"]) - packed["count"]
    assert np.array_equal(packed["max_tf"], np.maximum.reduceat(tfs, starts).astype(np.int32))
    assert np.array_equal(packed["min_norm"], np.minimum.reduceat(norms, starts).astype(np.int32))
    # term of each block maps back
    assert np.array_equal(np.repeat(packed["term_code"], packed["count"]), term_codes)


def test_pack_empty():
    p = codec.pack_postings_blocks(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint8)
    )
    assert len(p["doc_bytes"]) == 0


# ---------------------------------------------------------------------- BM25
def test_idf_float32():
    v = bm25.idf(3, 1000)
    assert v.dtype == np.float32
    assert v == np.float32(np.log(1 + (1000 - 3 + 0.5) / (3 + 0.5)))


def test_score_monotonicity():
    scorer = bm25.BM25(doc_count=1000, avgdl=np.float32(25.0))
    tfs = np.array([1, 2, 5, 10])
    norms = smallfloat.int_to_byte4(np.array([25, 25, 25, 25]))
    s = scorer.score(tfs, norms, doc_freq=10)
    assert s.dtype == np.float32
    assert np.all(np.diff(s) > 0)  # more tf -> higher
    # longer doc -> lower score at same tf
    s2 = scorer.score(np.array([2, 2]), smallfloat.int_to_byte4(np.array([10, 100])), doc_freq=10)
    assert s2[0] > s2[1]


def test_block_max_is_upper_bound():
    rng = np.random.default_rng(3)
    scorer = bm25.BM25(doc_count=5000, avgdl=np.float32(30.0))
    tfs = rng.integers(1, 20, 500)
    dls = rng.integers(1, 200, 500)
    norms = smallfloat.int_to_byte4(dls)
    s = scorer.score(tfs, norms, doc_freq=42)
    ub = scorer.max_block_score(int(tfs.max()), int(norms.min()), doc_freq=42)
    assert float(ub) >= float(s.max())


def test_known_score_value():
    # hand-computed: N=2, df=1, avgdl=3.0, dl=3, tf=2, k1=1.2, b=0.75
    scorer = bm25.BM25(doc_count=2, avgdl=np.float32(3.0))
    w = scorer.weight(1)
    assert w == np.float32(np.log(1 + (2 - 1 + 0.5) / 1.5))
    norm = smallfloat.int_to_byte4(np.array([3]))
    s = scorer.score(np.array([2]), norm, doc_freq=1)
    cache = 1.2 * ((1 - 0.75) + 0.75 * 3.0 / 3.0)  # = 1.2
    expected = np.float32(w * np.float32(2.0 / (2.0 + cache)))
    assert abs(float(s[0]) - float(expected)) < 1e-7


# ------------------------------------------------------------------ analysis
def test_standard_analyzer_tokens():
    a = analysis.standard_analyzer()
    assert a.tokens("Hello, World! 42 foo_bar") == ["hello", "world", "42", "foo", "bar"]
    assert a.tokens("don't STOP me") == ["don't", "stop", "me"]
    assert a.tokens("") == []
    assert a.tokens(None) == []


def test_max_token_length_skip():
    a = analysis.standard_analyzer()
    long_tok = "x" * 300
    toks = a.tokens(f"alpha {long_tok} beta")
    assert toks == ["alpha", "beta"]
    # position hole preserved
    assert a.tokens_with_positions(f"alpha {long_tok} beta") == [("alpha", 0), ("beta", 2)]


def test_stopword_positions():
    a = analysis.english_analyzer()
    assert a.tokens_with_positions("the quick fox") == [("quick", 1), ("fox", 2)]
    assert a.tokens("the and of") == []


def test_analyze_batch_matches_scalar():
    import pandas as pd

    a = analysis.english_analyzer()
    texts = pd.Series(["The quick brown fox", "", None, "the and of", "x " + "y" * 300 + " z"])
    flat, rows, dl = a.analyze_batch(texts)
    exp = [a.tokens(t) for t in ["The quick brown fox", "", "", "the and of", "x " + "y" * 300 + " z"]]
    assert list(dl) == [len(e) for e in exp]
    got_by_row = [list(flat[rows == i]) for i in range(5)]
    assert got_by_row == exp


def test_simple_analyzer_sql_parity():
    import duckdb

    a = analysis.simple_analyzer()
    samples = ["the Fast KEY 42a order", "a1 b2  c3", "", "hello world hello"]
    for s in samples:
        sql = duckdb.sql("select regexp_extract_all(lower(?), '[a-z0-9]+') as t", params=[s]).fetchone()[0]
        assert a.tokens(s) == list(sql)
