"""Text-analysis operators for a training-data pipeline.

All four are single-pass, shuffle-free column transforms over ``documents``
(a mapInPandas/built-in-function scan — the 100 TB plan is embarrassingly
parallel), with integer/deterministic outputs the DuckDB oracle re-derives:

- **language ID**: marker-word n-gram heuristic — score per language =
  number of tokens in that language's marker set; argmax with alphabetical
  tiebreak.  (A real pipeline plugs fasttext/cld3 into the same UDF shape.)
- **quality scoring**: token count, unique-token count, mean token length,
  stopword ratio — bucketed to integers.
- **token counting**: whitespace tokens vs BPE-ish regex tokens
  (``[a-z]+|[0-9]+|[^a-z0-9\\s]`` — letters, digit runs, punctuation marks).
- **document fingerprint**: rolling polynomial hash over token hashes
  (:func:`..functions.hashing.fold_tokens`) — an order-sensitive content id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .hashing import fold_tokens, poly31

# marker vocabularies (tiny, broadcast-free literals; same lists in oracle SQL)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "fast"),
    "de": ("der", "die", "und", "merge"),
    "es": ("el", "la", "los", "stream"),
    "fr": ("le", "la", "les", "join"),
    "zh": ("de", "shi", "bu", "window"),
}
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, score): marker-token language-ID heuristic."""
    langs = sorted(LANG_MARKERS)

    def fn(iterator):
        for pdf in iterator:
            toks = pdf[text_col].str.lower().str.findall(r"[a-z0-9]+")
            scores = np.zeros((len(pdf), len(langs)), dtype=np.int64)
            for li, lang in enumerate(langs):
                markers = set(LANG_MARKERS[lang])
                scores[:, li] = toks.map(lambda t: sum(1 for x in t if x in markers)).to_numpy()
            best = np.argmax(scores, axis=1)  # ties -> lowest index = alphabetical
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "pred_lang": np.asarray(langs, dtype=object)[best],
                    "score": scores[np.arange(len(pdf)), best],
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(fn, schema="doc_id bigint, pred_lang string, score bigint")


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique, mean_tok_len_x100, stop_ratio_x100,
    quality_bucket) — all integers.

    quality_bucket = floor(10 * n_unique / n_tokens) clamped to [0, 10]:
    a crude type-token-ratio quality signal (repetitive docs score low).
    """

    def fn(iterator):
        for pdf in iterator:
            toks = pdf[text_col].str.lower().str.findall(r"[a-z0-9]+")
            n = toks.str.len().to_numpy(dtype=np.int64)
            nu = toks.map(lambda t: len(set(t))).to_numpy(dtype=np.int64)
            tot_len = toks.map(lambda t: sum(len(x) for x in t)).to_numpy(dtype=np.int64)
            stops = set(STOPWORDS)
            n_stop = toks.map(lambda t: sum(1 for x in t if x in stops)).to_numpy(dtype=np.int64)
            safe_n = np.maximum(n, 1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "n_tokens": n,
                    "n_unique": nu,
                    "mean_tok_len_x100": (100 * tot_len) // safe_n,
                    "stop_ratio_x100": (100 * n_stop) // safe_n,
                    "quality_bucket": np.minimum((10 * nu) // safe_n, 10),
                }
            )

    schema = (
        "doc_id bigint, n_tokens bigint, n_unique bigint, mean_tok_len_x100 bigint, "
        "stop_ratio_x100 bigint, quality_bucket bigint"
    )
    return docs.select("doc_id", text_col).mapInPandas(fn, schema=schema)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace split vs BPE-ish regex.

    Pure built-in expressions — stays in whole-stage codegen, no Python.
    """
    t = F.lower(F.col(text_col))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.trim(t), r"\s+")).cast("long").alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_REGEX)).cast("long").alias("bpe_tokens"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique, dup_unigram_q, top_bigram_q): Gopher /
    RefinedWeb-style within-document repetition signals for training-data
    filtering (task-brief pipeline extension; no reference analog):

    - ``dup_unigram_q``  = floor((n_tokens - n_unique) * 1e6 / n_tokens) —
      the duplicate-token fraction;
    - ``top_bigram_q``   = floor(max_bigram_count * 1e6 / n_bigrams) — the
      fraction of all word bigrams taken by the most frequent one.

    One Arrow-batched mapInPandas scan (shuffle-free, embarrassingly
    parallel at 100 TB), exact integer outputs the oracle re-derives.  (A
    higher-order-function formulation was tried first and abandoned: Spark
    does not CSE inside lambda bodies, so ``filter(bg, ...)`` re-tokenized
    the document once per unique bigram — quadratic in document length.)

    The fixed-point division is exact floor division; the oracle's
    ``floor(x*1e6/y)`` double division agrees because the numerator stays
    below 2^53 and a true quotient is never within one double ulp of an
    integer it doesn't equal (|x/y − k| ≥ 1/y ≫ ulp)."""

    def fn(iterator):
        for pdf in iterator:
            toks = pdf[text_col].str.lower().str.findall(r"[a-z0-9]+")
            n = toks.str.len().to_numpy(dtype=np.int64)
            u = np.fromiter((len(set(t)) for t in toks), dtype=np.int64, count=len(toks))
            top_bg = np.zeros(len(toks), dtype=np.int64)
            for j, t in enumerate(toks):
                if len(t) >= 2:
                    _, counts = np.unique(
                        np.char.add(np.char.add(np.asarray(t[:-1], dtype=str), " "), np.asarray(t[1:], dtype=str)),
                        return_counts=True,
                    )
                    top_bg[j] = counts.max()
            dup_q = np.where(n > 0, (n - u) * 1_000_000 // np.maximum(n, 1), 0)
            top_q = np.where(n >= 2, top_bg * 1_000_000 // np.maximum(n - 1, 1), 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "n_tokens": n,
                    "n_unique": u,
                    "dup_unigram_q": dup_q,
                    "top_bigram_q": top_q,
                }
            )

    from ..session import spread_partitions

    return spread_partitions(docs.select("doc_id", text_col)).mapInPandas(
        fn,
        schema="doc_id bigint, n_tokens bigint, n_unique bigint, dup_unigram_q bigint, top_bigram_q bigint",
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): order-sensitive rolling-hash document fingerprint."""

    def fn(iterator):
        for pdf in iterator:
            toks = pdf[text_col].str.lower().str.findall(r"[a-z0-9]+")
            flat = [t for lst in toks for t in lst]
            lens = toks.str.len().to_numpy(dtype=np.int64)
            h = poly31(pd.Series(flat)) if flat else np.empty(0, np.int64)
            splits = np.cumsum(lens)[:-1]
            fps = fold_tokens(np.split(h, splits) if len(lens) else [])
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(dtype=np.int64), "fp": fps})

    from ..session import spread_partitions

    return spread_partitions(docs.select("doc_id", text_col)).mapInPandas(
        fn, schema="doc_id bigint, fp bigint"
    )


# PII shapes with portable regex syntax (no lookarounds), so the EXACT same
# patterns run in Spark and in the DuckDB oracle
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^\s]+"),
    ("longnum", r"[0-9][0-9 \-]{7,}[0-9]"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training-data release (no reference analog;
    task-brief text-analysis surface): replace emails, URLs, and long digit
    runs (phone/card shapes) with typed placeholders and report per-doc
    match counts.

    Returns ``(doc_id, n_email, n_url, n_longnum, redacted)``. Pure codegen
    (regexp_count / regexp_replace) — shuffle-free map pass; the patterns
    are shared literals so the correctness oracle replays them verbatim.
    """
    cols = [F.col("doc_id")]
    for name, pat in PII_PATTERNS:
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}"))
    red = F.col(text_col)
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    cols.append(red.alias("redacted"))
    return docs.select(*cols)
