"""FreeTextSuggester — "stupid backoff" n-gram language-model suggestions.

Reference: ``lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/FreeTextSuggester.java``:

- build (:224-345): shingle the corpus into 1..G-grams, count each gram,
  store count keyed by the separator-joined gram; ``totTokens`` = total
  unigram instances;
- lookup (:408-580): take the last 1..G-1 query tokens (the final token is a
  prefix unless the key ends past it, :464-476), walk levels from the highest
  gram order down; at each level find grams extending the prefix WITHOUT
  crossing a separator (i.e. completing only the final word, :512-519),
  score ``backoff * count / contextCount`` where ``contextCount`` is the
  count of the level's context gram (``totTokens`` at the unigram level,
  :500-510) and ``backoff`` multiplies by ``ALPHA = 0.4`` after every
  attempted level (:133,497,560); a word accepted at a higher level blocks
  the same completion at lower levels (``seen``, :524-551);
- final order: value desc, then key asc (UTF16), truncated to ``num``
  (:562-577).

Spark-first shape: the gram-count table is ONE DataFrame built by a
partition-local Arrow pass + a single ``groupBy(gram)`` shuffle of partial
counts (map-side combined in pandas).  Each lookup level is a prefix filter
on that table — with the table written sorted by ``gram``, parquet min/max
pruning serves the FST's prefix seek — plus a point lookup for the context
count; only the ≤ num accepted rows ever reach the driver.

Deviations (documented): the separator is a space (printable; the reference
uses 0x1E — the algebra is separator-agnostic), and ranking compares the
double score directly instead of the reference's ``(long)(2^63 * score)``
(distinct doubles of this magnitude stay distinct after the scale-and-
truncate, so the order is identical).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ALPHA = 0.4
_SCALE = float(2**63)  # (double) Long.MAX_VALUE


class FreeTextSuggester:
    def __init__(self, grams_df: DataFrame, tot_tokens: int, grams: int, analyzer, separator: str = " "):
        self.grams_df = grams_df  # (gram string, n int, cnt long)
        self.tot_tokens = int(tot_tokens)
        self.grams = int(grams)
        self.analyzer = analyzer
        self.sep = separator

    # ------------------------------------------------------------- build
    @staticmethod
    def build(
        corpus: DataFrame,
        analyzer,
        text_col: str = "text",
        grams: int = 3,
        separator: str = " ",
    ) -> "FreeTextSuggester":
        if grams < 1:
            raise ValueError("grams must be >= 1")

        def count_grams(iterator):
            # one numpy pass per gram order, no per-token Python: an n-gram
            # row survives only where all n positions share the doc id
            for pdf in iterator:
                if not len(pdf):
                    continue
                flat, rid, _dl = analyzer.analyze_batch(pdf[text_col])
                if not flat.size:
                    continue
                toks = flat.astype(object)
                frames = [pd.DataFrame({"gram": toks, "n": 1})]
                for n in range(2, grams + 1):
                    if len(toks) < n:
                        break
                    same = rid[: len(rid) - (n - 1)] == rid[n - 1 :]
                    g = toks[: len(toks) - (n - 1)].copy()
                    for j in range(1, n):
                        g = g + separator + toks[j : len(toks) - (n - 1) + j]
                    frames.append(pd.DataFrame({"gram": g[same], "n": n}))
                out = (
                    pd.concat(frames, ignore_index=True)
                    .groupby(["gram", "n"], sort=False)
                    .size()
                    .reset_index(name="cnt")
                )
                yield out.astype({"n": "int32", "cnt": "int64"})

        partial = corpus.select(text_col).mapInPandas(count_grams, schema="gram string, n int, cnt long")
        grams_df = partial.groupBy("gram", "n").agg(F.sum("cnt").alias("cnt"))
        tot = grams_df.where(F.col("n") == 1).agg(F.coalesce(F.sum("cnt"), F.lit(0))).collect()[0][0]
        return FreeTextSuggester(grams_df.persist(), int(tot), grams, analyzer, separator)

    # ------------------------------------------------------------ lookup
    def _last_tokens(self, key: str):
        toks = self.analyzer.tokens(key)
        if not toks:
            raise ValueError("no tokens produced by analyzer")
        ended = bool(re.search(r"[^a-zA-Z0-9]$", key))
        last: list = [None] * self.grams
        for g in range(self.grams):
            if len(toks) >= g + 1:
                last[g] = self.sep.join(toks[len(toks) - (g + 1) :])
        if ended:  # :464-476 — predict the next word, empty final fragment
            for i in range(self.grams - 1, 0, -1):
                if last[i - 1] is not None:
                    last[i] = last[i - 1] + self.sep
            last[0] = ""
        return last

    def lookup(self, key: str, num: int = 10) -> list:
        """Returns ``[(suggestion, score_double)]`` sorted (score desc, key
        asc), truncated to ``num`` — LookupResult order."""
        last = self._last_tokens(key)
        backoff = 1.0
        seen: set = set()
        results: list = []
        for g in range(self.grams - 1, -1, -1):
            token = last[g]
            if token is None or (token == "" and len(key) > 0):
                continue  # skipped levels do NOT consume backoff (:482-484)
            lvl = self.grams_df.where((F.col("n") == g + 1) & F.col("gram").startswith(token))
            rows = (
                lvl.orderBy(F.desc("cnt"), F.asc("gram"))
                .limit(num + len(seen))
                .collect()
            )
            if not rows:
                backoff *= ALPHA
                continue
            if g == 0:
                ctx = self.tot_tokens
            else:
                context = self.sep.join(token.split(self.sep)[:g])
                crow = self.grams_df.where(
                    (F.col("n") == g) & (F.col("gram") == context)
                ).collect()
                ctx = int(crow[0]["cnt"]) if crow else self.tot_tokens
            taken = 0
            for r in rows:
                word = r["gram"].split(self.sep)[-1]
                if word in seen:
                    continue
                seen.add(word)
                score = ((_SCALE * backoff) * float(r["cnt"])) / float(ctx)
                results.append((r["gram"], score))
                taken += 1
                if taken >= num:
                    break
            backoff *= ALPHA
        results.sort(key=lambda t: (-t[1], t[0]))
        return results[:num]

    def lookup_df(self, spark, key: str, num: int = 10) -> DataFrame:
        out = self.lookup(key, num)
        rows = [(i + 1, s) for i, (s, _v) in enumerate(out)]
        return spark.createDataFrame(rows, "rank int, suggestion string")
