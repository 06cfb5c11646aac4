"""Index splitting (MultiPassIndexSplitter / PKIndexSplitter analog):
byte-identity of pass-through blocks, decode-level equality of the
reassembled parts, per-part CheckIndex, stats partition, and the positional
round-trip through boundary blocks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.codec import unpack_blocks
from lucene_solr_spark.operators.checkindex import check_index
from lucene_solr_spark.operators.merge import split_index


BOUNDS = [37, 1000]  # 37 cuts inside blocks; 1000 at a block-ish scale


@pytest.fixture(scope="module")
def parts(index8):
    return split_index(index8, BOUNDS)


def _decoded(postings, codec):
    """{(term): sorted [(doc_id, tf, norm)]} decoded from block rows."""
    pdf = postings.toPandas()
    out = {}
    if len(pdf) == 0:
        return out
    doc_ids, tfs, norms, _ = unpack_blocks(
        pdf["doc_id_base"].to_numpy(dtype=np.int64),
        pdf["count"].to_numpy(dtype=np.int64),
        list(pdf["doc_ids"]),
        list(pdf["tfs"]),
        list(pdf["norms"]),
        codec=codec,
    )
    terms = np.repeat(pdf["term"].to_numpy(dtype=object), pdf["count"].to_numpy(dtype=np.int64))
    for t, d, f, n in zip(terms, doc_ids, tfs, norms):
        out.setdefault(t, []).append((int(d), int(f), int(n)))
    for t in out:
        out[t].sort()
    return out


def test_parts_reassemble_exactly(index8, parts):
    codec = index8.config.codec
    whole = _decoded(index8.postings, codec)
    merged: dict = {}
    for part in parts:
        for t, lst in _decoded(part.postings, codec).items():
            merged.setdefault(t, []).extend(lst)
    for t in merged:
        merged[t].sort()
    assert merged == whole


def test_parts_respect_ranges_and_stats(index8, parts):
    ranges = [(0, BOUNDS[0]), (BOUNDS[0], BOUNDS[1]), (BOUNDS[1], None)]
    assert sum(p.doc_count for p in parts) == index8.doc_count
    assert sum(p.sum_ttf for p in parts) == index8.sum_ttf
    for part, (lo, hi) in zip(parts, ranges):
        decoded = _decoded(part.postings, index8.config.codec)
        for t, lst in decoded.items():
            for d, _, _ in lst:
                assert d >= lo and (hi is None or d < hi)
        # docs table partitioned to the same range
        mm = part.docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        if mm[0] is not None:
            assert mm[0] >= lo and (hi is None or mm[1] < hi)


def test_parts_pass_checkindex(parts):
    for part in parts:
        summary = check_index(part, full=True)
        assert summary["decode_checked"]


def test_pass_through_blocks_byte_identical(index8, parts):
    """Blocks fully inside a part must keep their exact bytes (never decoded)."""
    lo, hi = BOUNDS[0], BOUNDS[1]
    orig = {
        (r["term"], r["run_id"], r["block_id"]): bytes(r["doc_ids"])
        for r in index8.postings.filter(
            (F.col("doc_id_base") >= lo) & (F.col("doc_id_max") < hi)
        ).collect()
    }
    got = {
        (r["term"], r["run_id"], r["block_id"]): bytes(r["doc_ids"])
        for r in parts[1]
        .postings.filter((F.col("doc_id_base") >= lo) & (F.col("doc_id_max") < hi))
        .collect()
    }
    # `got` additionally contains rewritten boundary pieces (they keep the
    # source block's id); every original fully-inside block must be present
    # with its exact bytes
    assert len(orig) > 0
    for k, b in orig.items():
        assert got[k] == b, k


def test_split_positional_roundtrip(spark, fixture_corpus_pdf):
    """Boundary blocks slice the position stream correctly."""
    from lucene_solr_spark.functions.codec import unpack_positions
    from lucene_solr_spark.operators.indexer import IndexConfig, assign_doc_ids, build_index

    df = spark.createDataFrame(fixture_corpus_pdf.head(300))
    corpus = assign_doc_ids(df, ("conv_id", "turn_idx"), n_partitions=4)
    idx = build_index(corpus, IndexConfig(n_partitions=4, index_positions=True))

    def positions_map(postings, codec):
        pdf = postings.toPandas()
        out = {}
        if len(pdf) == 0:
            return out
        doc_ids, tfs, norms, _ = unpack_blocks(
            pdf["doc_id_base"].to_numpy(dtype=np.int64),
            pdf["count"].to_numpy(dtype=np.int64),
            list(pdf["doc_ids"]),
            list(pdf["tfs"]),
            list(pdf["norms"]),
            codec=codec,
        )
        pos = unpack_positions(tfs, list(pdf["positions"]))
        terms = np.repeat(pdf["term"].to_numpy(dtype=object), pdf["count"].to_numpy(dtype=np.int64))
        oi = 0
        for t, d, f in zip(terms, doc_ids, tfs):
            out[(t, int(d))] = list(map(int, pos[oi : oi + f]))
            oi += f
        return out

    whole = positions_map(idx.postings, idx.config.codec)
    merged: dict = {}
    for part in split_index(idx, [55]):
        merged.update(positions_map(part.postings, idx.config.codec))
    assert merged == whole


def test_split_rejects_bad_boundaries(index8):
    with pytest.raises(ValueError):
        split_index(index8, [])
    with pytest.raises(ValueError):
        split_index(index8, [10, 10])
