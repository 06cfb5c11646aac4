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
