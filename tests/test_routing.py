"""CompositeIdRouter analog: murmur3 bit-exactness (public reference
vectors), composite-key bit splicing, ring partitioning, and the Spark
routing column.
"""

from lucene_solr_spark.functions.routing import (
    composite_id_hash,
    murmur3_x86_32,
    route,
    shard_of,
    shard_ranges,
)


def _u(x):
    return x & 0xFFFFFFFF


def test_murmur3_reference_vectors():
    # canonical murmur3_x86_32 vectors (same algorithm as Hash.java:242-297)
    assert _u(murmur3_x86_32("")) == 0x00000000
    assert _u(murmur3_x86_32("", 1)) == 0x514E28B7
    assert _u(murmur3_x86_32("hello")) == 0x248BFA47
    assert _u(murmur3_x86_32("hello, world")) == 0x149BBB7F
    assert _u(murmur3_x86_32("The quick brown fox jumps over the lazy dog")) == 0x2E4FF723
    assert _u(murmur3_x86_32("aaaa", 0x9747B28C)) == 0x5A97808A


def test_plain_id_is_murmur():
    assert composite_id_hash("doc42") == murmur3_x86_32("doc42")


def test_composite_two_level_bit_splice():
    h = _u(composite_id_hash("tenant!doc42"))
    assert h & 0xFFFF0000 == _u(murmur3_x86_32("tenant")) & 0xFFFF0000
    assert h & 0x0000FFFF == _u(murmur3_x86_32("doc42")) & 0x0000FFFF


def test_composite_bits_override():
    h = _u(composite_id_hash("tenant/8!doc42"))
    assert h & 0xFF000000 == _u(murmur3_x86_32("tenant")) & 0xFF000000
    assert h & 0x00FFFFFF == _u(murmur3_x86_32("doc42")) & 0x00FFFFFF


def test_trailing_separator_hashes_empty_tail():
    h = _u(composite_id_hash("tenant!"))
    assert h & 0xFFFF0000 == _u(murmur3_x86_32("tenant")) & 0xFFFF0000
    assert h & 0x0000FFFF == _u(murmur3_x86_32("")) & 0x0000FFFF


def test_tri_level_8_8_split():
    h = _u(composite_id_hash("app!user!doc"))
    assert h & 0xFF000000 == _u(murmur3_x86_32("app")) & 0xFF000000
    assert h & 0x00FF0000 == _u(murmur3_x86_32("user")) & 0x00FF0000
    assert h & 0x0000FFFF == _u(murmur3_x86_32("doc")) & 0x0000FFFF


def test_shard_ranges_cover_ring():
    for n in (1, 2, 3, 7, 16):
        rs = shard_ranges(n)
        assert rs[0][0] == -(1 << 31) and rs[-1][1] == (1 << 31) - 1
        for (a, b), (c, d) in zip(rs, rs[1:]):
            assert c == b + 1
        for h in (-(1 << 31), -1, 0, 1, (1 << 31) - 1):
            s = shard_of(h, n)
            assert rs[s][0] <= h <= rs[s][1]


def test_route_colocates_shard_keys(spark_corpus):
    routed = route(spark_corpus.select("doc_id", "conv_id"), "conv_id", 8)
    per_key = routed.groupBy("conv_id").agg({"shard": "max"}).count()
    distinct_pairs = routed.select("conv_id", "shard").distinct().count()
    assert per_key == distinct_pairs, "every conv routes to exactly one shard"
    vals = [r["shard"] for r in routed.select("shard").distinct().collect()]
    assert all(0 <= v < 8 for v in vals) and len(vals) > 1
    # spot-check bit-exactness through the Spark path
    row = routed.limit(1).collect()[0]
    assert row["shard"] == shard_of(composite_id_hash(row["conv_id"]), 8)
