"""Context-window document chunking for training-data pipelines.

No reference analog (task-brief training-pipeline surface): the standard
pre-tokenization step that splits long documents into overlapping
``max_tokens`` windows so they fit a model's context. Token boundaries use
the oracle-reproducible simple pattern (``[a-z0-9]+`` over the lowercased
text — the same definition the engine's SQL oracles replay), and a chunk's
text is the space-joined token slice, so both sides of the correctness gate
compute literally the same strings.

Spark-first: pure higher-order Catalyst expressions (regexp_extract_all ->
sequence -> posexplode -> slice/array_join) — whole-stage codegen, no UDF,
no shuffle; at 100 TB this is a map-only pass whose output is immediately
partition-local for the downstream tokenizer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each doc into windows of ``max_tokens`` tokens advancing by
    ``max_tokens - overlap``: ``(doc_id, chunk_id, start_token, n_tokens,
    chunk_text)``.  The final window may be shorter; empty docs emit
    nothing. ``0 <= overlap < max_tokens`` (the stride must advance).

    The start sequence stops at the FIRST window that covers the token tail:
    a start is emitted only while ``start + overlap < size`` (bound
    ``size - overlap - 1``), so with overlap > 0 no trailing window is a pure
    suffix of its predecessor (e.g. 10 tokens / max 8 / overlap 4 emits
    [0,8) and [4,10) — never a redundant [8,10) that would duplicate text in
    training-data output)."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not (0 <= overlap < max_tokens):
        raise ValueError("require 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '([a-z0-9]+)', 1)")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks")).where(
        F.size("_toks") > 0
    )
    starts = F.expr(f"sequence(0, greatest(size(_toks) - {overlap} - 1, 0), {step})")
    exploded = base.select("doc_id", "_toks", F.posexplode(starts).alias("chunk_id", "start_token"))
    piece = F.expr(f"slice(_toks, start_token + 1, {max_tokens})")
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int"),
        F.col("start_token").cast("int"),
        F.size(piece).cast("int").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    block_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """GPT-style concat-then-chunk sequence packing placement.

    The standard LLM pre-training packing step: documents are concatenated
    in stable ``doc_id`` order into one global token stream, which is then
    cut into fixed ``block_tokens`` training blocks.  Returns each doc's
    placement in that stream — ``(doc_id, n_tokens, token_start,
    first_block, last_block)`` — so the downstream tokenizer/writer knows
    exactly which training sequences each document lands in (and hence which
    block boundaries split it).  Empty docs (0 tokens) are excluded; token
    boundaries use the engine's oracle-reproducible ``[a-z0-9]+`` pattern,
    the same definition as :func:`chunk_documents`.

    Scale design: the global running token count is NOT a global window
    (which would funnel 100 TB through one partition).  It is the same
    two-pass partition-offset scheme as ``indexer.assign_doc_ids``:
    range-partition + sort by ``doc_id``, collect per-partition token sums
    (one tiny row per partition), then add each partition's cumulative base
    to a local vectorized cumsum inside ``mapInPandas`` — one shuffle total,
    every partition independent.
    """
    if block_tokens < 1:
        raise ValueError("block_tokens must be >= 1")
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '([a-z0-9]+)', 1)")
    counts = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.size(toks).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    n = n_partitions or docs.rdd.getNumPartitions() or 8
    placed = counts.repartitionByRange(n, "doc_id").sortWithinPartitions("doc_id").persist()
    part_sums = (
        placed.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("n_tokens").alias("toks"))
        .orderBy("pid")
        .collect()
    )
    bases = {}
    acc = 0
    for row in part_sums:
        bases[row["pid"]] = acc
        acc += row["toks"]

    bsz = int(block_tokens)

    def place(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        start = bases.get(pid, 0)
        for pdf in iterator:
            if not len(pdf):
                continue
            nt = pdf["n_tokens"].to_numpy(dtype=np.int64)
            ends = start + np.cumsum(nt)
            starts = ends - nt
            start = int(ends[-1])
            yield type(pdf)(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": nt,
                    "token_start": starts,
                    "first_block": starts // bsz,
                    "last_block": (ends - 1) // bsz,
                }
            )

    out = placed.mapInPandas(
        place,
        schema="doc_id bigint, n_tokens bigint, token_start bigint, first_block bigint, last_block bigint",
    )
    return out
