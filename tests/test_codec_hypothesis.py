"""Property-based codec tests (hypothesis) — RandomPostingsTester analog.

The reference fuzzes every postings codec with random term/posting sets
(``reference lucene/test-framework/.../index/RandomPostingsTester.java:66``);
here hypothesis generates adversarial varint values and posting layouts and
shrinks failures to minimal cases.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.functions.codec import (
    decode_varint,
    encode_varint,
    pack_postings_blocks,
    unpack_blocks,
    unpack_positions,
    varint_sizes,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_any_values(vals):
    arr = np.asarray(vals, dtype=np.int64)
    out = decode_varint(encode_varint(arr))
    assert out.tolist() == vals


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_varint_sizes_match_encoding(vals):
    arr = np.asarray(vals, dtype=np.int64)
    sizes = varint_sizes(arr)
    assert int(sizes.sum()) == len(encode_varint(arr))


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # term code
        st.integers(min_value=0, max_value=10_000),  # doc id
        st.integers(min_value=1, max_value=300),  # tf
        st.integers(min_value=0, max_value=255),  # norm
    ),
    min_size=1,
    max_size=300,
)


@given(posting_lists, st.sampled_from([4, 16, 128]))
@settings(max_examples=60, deadline=None)
def test_pack_unpack_property(recs, block_size):
    # dedupe (term, doc) and sort — the packer's input contract
    uniq = {}
    for t, d, tf, nm in recs:
        uniq[(t, d)] = (tf, nm)
    recs = sorted((t, d, tf, nm) for (t, d), (tf, nm) in uniq.items())
    tc = np.array([r[0] for r in recs], dtype=np.int64)
    di = np.array([r[1] for r in recs], dtype=np.int64)
    tf = np.array([r[2] for r in recs], dtype=np.int64)
    nm = np.array([r[3] for r in recs], dtype=np.uint8)
    # positions: tf ascending ints per posting
    pos = np.concatenate([np.arange(x) * 2 + 1 for x in tf])

    packed = pack_postings_blocks(tc, di, tf, nm, block_size=block_size, positions=pos)
    d2, t2, n2, blk = unpack_blocks(
        packed["doc_id_base"], packed["count"], packed["doc_bytes"], packed["tf_bytes"], packed["norm_bytes"]
    )
    assert d2.tolist() == di.tolist()
    assert t2.tolist() == tf.tolist()
    assert n2.tolist() == nm.tolist()
    p2 = unpack_positions(t2, packed["pos_bytes"])
    assert p2.tolist() == pos.tolist()
    # per-block impacts are sound upper/lower bounds
    counts = packed["count"]
    starts = np.cumsum(counts) - counts
    assert (np.maximum.reduceat(tf, starts) == packed["max_tf"]).all()
    assert (np.minimum.reduceat(nm, starts) == packed["min_norm"]).all()
    assert (counts <= block_size).all() and (counts >= 1).all()


# ---------------------------------------------------------------- FOR-128

from lucene_solr_spark.functions.codec import for_decode_blocks, for_encode_blocks


@given(posting_lists, st.sampled_from([16, 128]))
@settings(max_examples=60, deadline=None)
def test_for128_pack_matches_varint_pack(recs, block_size):
    """Both codecs must produce identical decoded postings and identical
    block metadata (impacts, bases, counts) — only the payload bytes differ."""
    uniq = {}
    for t, d, tf, nm in recs:
        uniq[(t, d)] = (tf, nm)
    recs = sorted((t, d, tf, nm) for (t, d), (tf, nm) in uniq.items())
    tc = np.array([r[0] for r in recs], dtype=np.int64)
    di = np.array([r[1] for r in recs], dtype=np.int64)
    tf = np.array([r[2] for r in recs], dtype=np.int64)
    nm = np.array([r[3] for r in recs], dtype=np.uint8)

    pv = pack_postings_blocks(tc, di, tf, nm, block_size=block_size, codec="varint")
    pf = pack_postings_blocks(tc, di, tf, nm, block_size=block_size, codec="for128")
    for k in ("term_code", "block_id", "doc_id_base", "doc_id_max", "count", "max_tf", "min_norm", "sum_tf"):
        assert np.asarray(pv[k]).tolist() == np.asarray(pf[k]).tolist()
    out = unpack_blocks(
        pf["doc_id_base"], pf["count"], pf["doc_bytes"], pf["tf_bytes"], pf["norm_bytes"],
        codec="for128", block_size=block_size,
    )
    assert out[0].tolist() == di.tolist()
    assert out[1].tolist() == tf.tolist()
    assert out[2].tolist() == nm.tolist()


@given(
    st.lists(st.integers(min_value=0, max_value=2**62 - 1), min_size=1, max_size=400),
    st.sampled_from([8, 128]),
)
@settings(max_examples=120, deadline=None)
def test_for128_roundtrip_any_values(vals, block_size):
    arr = np.asarray(vals, dtype=np.int64)
    n_blocks = (arr.size + block_size - 1) // block_size
    starts = np.arange(n_blocks, dtype=np.int64) * block_size
    counts = np.minimum(arr.size - starts, block_size)
    enc = for_encode_blocks(arr, starts, counts, block_size)
    dec = for_decode_blocks(enc, counts, block_size)
    assert dec.tolist() == vals


def test_for128_all_equal_collapses():
    """A full block of one repeated value is the 2-byte ALL_VALUES_EQUAL form
    (header 0 + 1-byte varint) — ForUtil.java:42's special case."""
    vals = np.full(128, 3, dtype=np.int64)
    enc = for_encode_blocks(vals, np.array([0]), np.array([128]))
    assert len(enc[0]) == 2 and enc[0][0] == 0
    assert for_decode_blocks(enc, np.array([128])).tolist() == vals.tolist()
