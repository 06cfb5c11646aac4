"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The tokenizer-training step of an LLM data pipeline, built the way real BPE
trainers shard the work: the 100 TB corpus contributes ONE word-count
aggregation (map-side combinable groupBy — the only corpus-scale exchange),
and the merge-learning loop runs over the aggregated *vocabulary* (word
types × counts), which is many orders of magnitude smaller than the corpus
and lives comfortably on the driver — the same split HuggingFace
``tokenizers`` / sentencepiece use (count in parallel, learn on the counts).
Encoding likewise touches each DISTINCT word once (vocab-scale), then joins
the per-word token counts back onto the corpus occurrences.

No reference analog (task-brief surface, like chunking/sampling); word
boundaries use the engine's oracle-reproducible ``[a-z0-9]+`` rule, the
same definition as :func:`..operators.chunking.chunk_documents`.

Merge semantics (both learn and encode): merges apply in rank order; one
pass per rank merges every left-to-right non-overlapping occurrence of the
pair.  For *learned* merge tables this is exactly classic BPE encoding —
any pair containing a symbol created by merge r was learned after r, so
ascending-rank application never misses a lower-rank opportunity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["word_counts", "bpe_pair_counts", "bpe_learn", "bpe_encode_counts"]

WORD_PATTERN = "[a-z0-9]+"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): corpus word frequencies — the ONE corpus-scale shuffle
    of BPE training (partial aggregation map-side; the exchange carries one
    row per distinct word per partition)."""
    w = F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '({WORD_PATTERN})', 1)"))
    return docs.select(w.alias("word")).groupBy("word").agg(F.count("*").cast("long").alias("cnt"))


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(pair, cnt): round-0 adjacent-symbol (= character) pair frequencies,
    weighted by word occurrence — the statistic the first BPE merge
    maximizes.  Derived from the word-count table, NOT by re-walking the
    corpus: pairs per word type × word count, so the pair explosion is
    vocab-scale."""
    wc = word_counts(docs, text_col).filter(F.length("word") >= 2)
    pair = F.explode(
        F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
    )
    return (
        wc.select(pair.alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def _merge_word(syms: list, left: str, right: str) -> list:
    """One rank's pass: merge every left-to-right non-overlapping (l, r)."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_word_types: Optional[int] = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus.  Deterministic: the
    best pair each round is (count desc, pair lexicographic asc) — no hash
    iteration order anywhere.

    ``max_word_types`` caps the vocabulary brought to the driver (top-N by
    count desc, word asc).  This is a declared cap, not silent truncation:
    at web scale the head types carry almost all pair mass (Zipf), and the
    cap bounds driver memory at O(max_word_types) regardless of corpus
    size.  Pass None to disable (tests / small corpora).
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    wc = word_counts(docs, text_col)
    if max_word_types is not None:
        wc = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(int(max_word_types))
    vocab = [(r["word"], int(r["cnt"])) for r in wc.collect()]
    words = [list(w) for w, _ in vocab]
    counts = [c for _, c in vocab]

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        l, r = best
        words = [
            _merge_word(syms, l, r) if l in syms and r in syms else syms for syms in words
        ]
    return merges


def bpe_encode_counts(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc token statistics under a fixed merge table:
    ``(doc_id, n_words, n_tokens)``.

    Scale shape: the corpus side is explode + join + groupBy(doc) — pure
    Catalyst.  The actual BPE merge loop runs once per DISTINCT word inside
    ``mapInPandas`` (vocab-scale, not corpus-scale), and the resulting
    (word → n_subtokens) table joins back onto the occurrences.  Docs with
    zero words are excluded (no tokens to count)."""
    merges = [(str(l), str(r)) for l, r in merges]
    toks = F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '({WORD_PATTERN})', 1)"))
    occ = docs.select(F.col(id_col).cast("long").alias("doc_id"), toks.alias("word"))
    distinct_words = occ.select("word").distinct()

    def encode(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            ws = pdf["word"].tolist()
            n_sub = np.empty(len(ws), dtype=np.int64)
            for j, w in enumerate(ws):
                syms = list(w)
                for l, r in merges:
                    if len(syms) > 1:
                        syms = _merge_word(syms, l, r)
                n_sub[j] = len(syms)
            yield pd.DataFrame({"word": ws, "n_subtokens": n_sub})

    word_tokens = distinct_words.mapInPandas(encode, schema="word string, n_subtokens bigint")
    return (
        occ.join(word_tokens, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_subtokens").cast("long").alias("n_tokens"),
        )
    )
