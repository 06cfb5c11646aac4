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

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents"]


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
