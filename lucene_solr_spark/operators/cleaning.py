"""C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning...", §2.2 — the rule set behind the C4 corpus).

No reference analog; task-brief training-pipeline surface, the sibling of
:func:`~lucene_solr_spark.operators.dedup.line_dedup` (CCNet boilerplate
pass): C4's rules are static per-line/per-doc predicates, so unlike the
dedup pass they need NO cross-document state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", Table A1) — the doc-level heuristics every
    LLM-pretraining pipeline runs next to the C4 line rules and the
    repetition filters (``textstats.repetition_stats``).  No reference
    analog; task-brief training-pipeline surface.

    Every ratio rule is evaluated in EXACT INTEGER arithmetic (cross-
    multiplied rational inequalities), so the DuckDB oracle matches
    bit-for-bit with no float quantization at all:

    - word count in ``[min_words, max_words]``
    - mean word length in [3, 10]          ⇔  3·n_words ≤ chars ≤ 10·n_words
    - symbol-to-word ratio ('#', '...') ≤ 0.1  ⇔  10·n_symbols ≤ n_words
    - ≥ 80 % of words contain a letter     ⇔  5·n_alpha ≥ 4·n_words
    - bullet-starting lines ≤ 90 %         ⇔  10·n_bullet ≤ 9·n_lines
    - ellipsis-ending lines ≤ 30 %         ⇔  10·n_ell_end ≤ 3·n_lines
    - contains ≥ 2 distinct Gopher stop words (the/be/to/of/and/that/have/with)

    Returns every doc with its counters and ``kept`` 0/1 — pure Catalyst
    higher-order expressions inside the scan task, zero exchanges (each
    rule reads one document), no UDF.
    """
    words = F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")
    toks = F.expr(f"array_distinct(regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0))")
    lines = F.split(F.col(text_col), delim, -1)
    # delim escaped for embedding in a SQL string literal ('\n' -> '\\n')
    dl = delim.encode("unicode_escape").decode().replace("'", "\\'")
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(words).cast("long").alias("n_words"),
        F.expr(
            f"aggregate(regexp_extract_all({text_col}, '\\\\S+', 0), cast(0 as bigint),"
            " (a, w) -> a + length(w))"
        ).alias("chars"),
        F.expr(
            f"size(filter(regexp_extract_all({text_col}, '\\\\S+', 0), w -> w rlike '[a-zA-Z]'))"
        )
        .cast("long")
        .alias("n_alpha"),
        (
            F.size(F.expr(f"regexp_extract_all({text_col}, '#', 0)"))
            + F.size(F.expr(f"regexp_extract_all({text_col}, '\\\\.\\\\.\\\\.', 0)"))
        )
        .cast("long")
        .alias("n_symbols"),
        F.size(lines).cast("long").alias("n_lines"),
        F.expr(f"size(filter(split({text_col}, '{dl}', -1), l -> ltrim(l) rlike '^[-*\u2022]'))")
        .cast("long")
        .alias("n_bullet"),
        F.expr(f"size(filter(split({text_col}, '{dl}', -1), l -> rtrim(l) rlike '\\\\.\\\\.\\\\.$'))")
        .cast("long")
        .alias("n_ell_end"),
        F.size(F.array_intersect(toks, F.expr(f"array({stops})"))).cast("long").alias("n_stop"),
    )
    kept = (
        (F.col("n_words") >= int(min_words))
        & (F.col("n_words") <= int(max_words))
        & (3 * F.col("n_words") <= F.col("chars"))
        & (F.col("chars") <= 10 * F.col("n_words"))
        & (10 * F.col("n_symbols") <= F.col("n_words"))
        & (5 * F.col("n_alpha") >= 4 * F.col("n_words"))
        & (10 * F.col("n_bullet") <= 9 * F.col("n_lines"))
        & (10 * F.col("n_ell_end") <= 3 * F.col("n_lines"))
        & (F.col("n_stop") >= 2)
    )
    return d.withColumn("kept", F.when(kept, F.lit(1)).otherwise(F.lit(0)).cast("long"))


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
