"""Instruction-tuning example extraction over multi-turn transcripts.

The training-data step between the corpus this engine indexes (Iceberg-style
``(conv_id, turn_idx, role, text, ...)`` transcript turns — the same table
shape the index build consumes, FIXTURES.md §1) and an SFT trainer: render
each target-role turn into a ``(context, target)`` pair with exact
character-offset loss masks, the conversation flattening every chat-model pipeline
performs before tokenization.

Spark-first shape: ONE window per conversation (shuffle keyed ``conv_id`` —
the minimal, unavoidable exchange; turns of one conversation must meet), all
string assembly in pure Catalyst (``collect_list`` over the ordered window →
``slice`` → ``array_join``), no UDF, no second shuffle.  At 10^12 turns the
window state per key is a handful of turns — bounded by conversation length,
never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sft_pairs(
    turns: DataFrame,
    max_context_turns: int = 3,
    target_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """``(conv_id, turn_idx, context, target, loss_start, loss_len)`` — one
    row per ``target_role`` turn.

    ``context`` is the last ``max_context_turns`` prior turns rendered as
    ``<role> text`` joined by newlines (prior = strictly before the target
    turn in ``idx_col`` order).  The full training example is::

        context + "\\n" + "<{target_role}> " + target      (context nonempty)
        "<{target_role}> " + target                         (first turn)

    and ``loss_start``/``loss_len`` are the 0-based CHARACTER (not byte)
    offset and length of ``target`` inside that rendered string — exact
    under any slicing that counts codepoints; a byte-oriented consumer
    must re-measure after encoding — the loss-mask span a
    trainer applies after tokenization (prompt tokens masked, target tokens
    live).  Every step is replayable in ANSI SQL: the ordered-window
    ``collect_list`` is deterministic because the frame is ordered by
    ``idx_col`` (unique per conversation under the ingest contract).
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL text renders as the empty string: concat/collect_list would
    # otherwise silently DROP the whole turn from the context window
    # (collect_list skips nulls), shifting the last-n slice
    txt = F.coalesce(F.col(text_col), F.lit(""))
    rendered = F.concat(F.lit("<"), F.col(role_col), F.lit("> "), txt)
    ctx_all = F.collect_list(rendered).over(w)
    # last-n via positive indexing: start = max(1, len - n + 1) — identical
    # semantics in Spark slice() and DuckDB list_slice(), no negative-start
    # edge cases on short conversations
    n = int(max_context_turns)
    start = F.greatest(F.lit(1), F.size(ctx_all) - F.lit(n - 1))
    ctx = F.array_join(F.slice(ctx_all, start, n), "\n")
    header_len = len(f"<{target_role}> ")
    loss_start = (
        F.length(ctx) + F.when(F.length(ctx) > 0, F.lit(1)).otherwise(F.lit(0)) + F.lit(header_len)
    )
    return (
        turns.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col(role_col).alias("_role"),
            ctx.alias("context"),
            txt.alias("target"),
            loss_start.cast("long").alias("loss_start"),
            F.length(txt).cast("long").alias("loss_len"),
        )
        .filter(F.col("_role") == target_role)
        .drop("_role")
    )


def render_example(context: str, target: str, target_role: str = "assistant") -> str:
    """The rendered training string a (context, target) pair flattens to —
    the definition ``loss_start``/``loss_len`` index into (shared by the
    pytest that checks the mask recovers the target character-for-character)."""
    head = f"<{target_role}> "
    return (context + "\n" + head + target) if context else (head + target)
