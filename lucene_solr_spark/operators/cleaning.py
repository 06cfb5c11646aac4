"""C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning...", §2.2 — the rule set behind the C4 corpus).

No reference analog; task-brief training-pipeline surface, the sibling of
:func:`~lucene_solr_spark.operators.dedup.line_dedup` (CCNet boilerplate
pass): C4's rules are static per-line/per-doc predicates, so unlike the
dedup pass they need NO cross-document state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def c4_clean(
    docs: DataFrame,
    min_words_per_line: int = 5,
    min_lines: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Apply the C4 line and document rules; returns EVERY input doc as
    ``(doc_id, clean_text, n_lines, n_kept, kept_doc)`` so a pipeline can
    audit what was dropped (``kept_doc`` = 1 iff the document survives).

    Line rules — a line is kept only if it (a) ends in terminal
    punctuation (``.``, ``!``, ``?``, ``"``; trailing whitespace ignored),
    (b) has at least ``min_words_per_line`` whitespace-delimited words, and
    (c) does not mention ``javascript`` (case-insensitive).  Document
    rules — the doc is dropped if the RAW text contains a curly brace or
    the phrase ``lorem ipsum``, or if fewer than ``min_lines`` lines
    survive the line pass.

    Plan shape at scale: the line pass is a stateless filter inside the
    scan task (codegen regexes, zero exchanges — C4's rules look at one
    line at a time); the only shuffle is the doc-keyed groupBy that
    reassembles surviving lines, the unavoidable exchange of any
    document-reconstruction step.  No Python in the hot path.
    """
    raw = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_raw"))
    lines = raw.select(
        "doc_id",
        "_raw",
        F.posexplode(F.split(F.col("_raw"), delim, -1)).alias("pos", "line"),
    )
    line_ok = (
        F.rtrim(F.col("line")).rlike('[.!?"]$')
        & (F.size(F.expr("regexp_extract_all(line, '\\\\S+', 0)")) >= int(min_words_per_line))
        & ~F.lower(F.col("line")).contains("javascript")
    )
    kept = lines.filter(line_ok)
    reb = kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
            delim,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    doc_bad = F.col("_raw").contains("{") | F.lower(F.col("_raw")).contains("lorem ipsum")
    base = raw.select(
        "doc_id",
        F.size(F.split(F.col("_raw"), delim, -1)).cast("long").alias("n_lines"),
        doc_bad.alias("_bad"),
    )
    out = base.join(reb, "doc_id", "left").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.when(
            ~F.col("_bad") & (F.coalesce(F.col("n_kept"), F.lit(0)) >= int(min_lines)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept_doc"),
    )
    return out
