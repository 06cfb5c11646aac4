"""Weighted completion suggesters: AnalyzingSuggester, FuzzySuggester,
BlendedInfixSuggester.

Re-expression of the reference suggest/analyzing module:

- ``AnalyzingSuggester`` (``reference lucene/suggest/src/java/org/apache/
  lucene/search/suggest/analyzing/AnalyzingSuggester.java``): entries are
  (surface, weight); the lookup key is the ANALYZED surface (tokens joined
  with a separator — PRESERVE_SEP); results are completions of the analyzed
  input ranked weight-desc, with EXACT_FIRST putting exact key matches ahead.
- ``FuzzySuggester`` (``FuzzySuggester.java:87-109``): like
  AnalyzingSuggester but the typed input may contain up to ``maxEdits`` (=1)
  errors — a key matches when one of its prefixes lies within edit distance
  of the input; the first ``nonFuzzyPrefix`` (=1) character must match
  exactly and no edits are allowed until the input reaches
  ``minFuzzyLength`` (=3).
- ``BlendedInfixSuggester`` (``BlendedInfixSuggester.java:62-93,215-233``):
  infix matches where the weight is blended by the position of the first
  matched token — POSITION_LINEAR ``w·(1 − 0.10·pos)``,
  POSITION_RECIPROCAL ``w/(1+pos)`` — with coefficient 1 when the surface
  starts with the query; small weights are pre-scaled by 1/0.10 and the
  final score truncates to long (``:227-233``).

Spark-first: the suggestion table replaces the FST — key-sorted parquet
gives prefix pruning via min/max stats; every lookup is one pruned scan +
TakeOrderedAndProject (per-partition top-n heap).  The fuzzy predicate is
built-in ``levenshtein`` over the three candidate prefix lengths — pure
Catalyst, no UDF (``transpositions=False``; the reference default enables
adjacent-swap edits inside the Levenshtein automaton, a documented
deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["AnalyzingSuggester", "FuzzySuggester", "KeywordAnalyzer", "blended_infix_lookup"]

SEP = " "  # PRESERVE_SEP token separator


class KeywordAnalyzer:
    """The whole input as ONE token, case preserved (``reference lucene/
    analysis/common/src/java/org/apache/lucene/analysis/core/
    KeywordAnalyzer.java`` ≡ MockTokenizer.KEYWORD with lowercase off) —
    the analyzer the reference suggester test suite builds its golden
    lookups under."""

    def tokens_column(self, col):
        return F.array(col)

    def tokens(self, s: str):
        return [s]


class AnalyzingSuggester:
    """Completion over (surface, weight) entries keyed by the analyzed form."""

    def __init__(self, suggestions: DataFrame, analyzer):
        self.suggestions = suggestions  # (key, surface, weight)
        self.analyzer = analyzer

    @classmethod
    def build(cls, entries: DataFrame, analyzer) -> "AnalyzingSuggester":
        """``entries``: (surface string, weight long).  The key column is the
        analyzer's token stream re-joined with the separator; stored sorted
        by key so prefix lookups prune files/row-groups."""
        toks = analyzer.tokens_column(F.col("surface")) if hasattr(analyzer, "tokens_column") else None
        if toks is None:
            # default chain = lowercase + non-alphanumeric split (the
            # simple_analyzer contract used across the engine)
            toks = F.filter(F.split(F.lower(F.col("surface")), "[^a-z0-9]+"), lambda x: x != F.lit(""))
        sugg = (
            entries.select(
                F.array_join(toks, SEP).alias("key"),
                F.col("surface").cast("string").alias("surface"),
                F.col("weight").cast("long").alias("weight"),
            )
            .filter(F.col("key") != "")
            .sortWithinPartitions("key")
        )
        return cls(sugg.persist(), analyzer)

    def _analyze_query(self, q: str) -> str:
        toks = self.analyzer.tokens(q)
        return SEP.join(toks)

    def lookup(self, q: str, n: int = 5, exact_first: bool = True) -> DataFrame:
        p = self._analyze_query(q)
        out = self.suggestions.filter(F.col("key").startswith(p))
        order = [F.desc("weight"), F.asc("key"), F.asc("surface")]
        if exact_first:
            out = out.withColumn("_exact", (F.col("key") == p).cast("int"))
            order = [F.desc("_exact")] + order
        return out.orderBy(*order).limit(int(n)).select("surface", "weight")


class FuzzySuggester(AnalyzingSuggester):
    """AnalyzingSuggester tolerant of typos in the typed input."""

    def __init__(self, suggestions, analyzer, max_edits: int = 1, non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 3):
        super().__init__(suggestions, analyzer)
        if max_edits < 0 or max_edits > 2:
            raise ValueError("max_edits must be in [0, 2] (LevenshteinAutomata limit)")
        self.max_edits = max_edits
        self.non_fuzzy_prefix = non_fuzzy_prefix
        self.min_fuzzy_length = min_fuzzy_length

    @classmethod
    def build(cls, entries: DataFrame, analyzer, **kw) -> "FuzzySuggester":
        base = AnalyzingSuggester.build(entries, analyzer)
        return cls(base.suggestions, analyzer, **kw)

    def lookup(self, q: str, n: int = 5, exact_first: bool = True) -> DataFrame:
        p = self._analyze_query(q)
        key = F.col("key")
        pred = key.startswith(p)
        if len(p) >= self.min_fuzzy_length and self.max_edits > 0:
            # a key matches when one of its prefixes (lengths |p|±maxEdits)
            # is within maxEdits of the input, anchored on the exact
            # nonFuzzyPrefix (FuzzySuggester.java:87-109: the automaton
            # intersects key prefixes with LEV(input, maxEdits))
            anchor = key.startswith(p[: self.non_fuzzy_prefix]) if self.non_fuzzy_prefix else F.lit(True)
            fuzzy = F.lit(False)
            for L in range(len(p) - self.max_edits, len(p) + self.max_edits + 1):
                if L < 1:
                    continue
                fuzzy = fuzzy | (F.levenshtein(F.substring(key, 1, L), F.lit(p)) <= self.max_edits)
            pred = pred | (anchor & fuzzy)
        out = self.suggestions.filter(pred)
        order = [F.desc("weight"), F.asc("key"), F.asc("surface")]
        if exact_first:
            out = out.withColumn("_exact", (key == p).cast("int"))
            order = [F.desc("_exact")] + order
        return out.orderBy(*order).limit(int(n)).select("surface", "weight")


def blended_infix_lookup(
    suggester: AnalyzingSuggester,
    q: str,
    n: int = 5,
    blender: str = "position_linear",
    exponent: float = 2.0,
    num_factor: int = 10,
) -> DataFrame:
    """BlendedInfixSuggester.lookup: infix token match, weight blended by the
    first matched token's position.

    Reference semantics (``BlendedInfixSuggester.java:215-233,277-300``):
    coefficient 1 when the key starts with the query; otherwise
    position-based over the FIRST token matching the (single-token) query
    prefix; weights in (-10, 10) pre-scale by 10 (``1/LINEAR_COEF``); the
    blended score truncates to long.  Over-requests ``n·num_factor``
    candidates by raw weight before blending, like the reference's
    ``num * numFactor`` inner lookup.
    """
    p = suggester._analyze_query(q)
    toks = F.split(F.col("key"), SEP)
    # position of the first token starting with the query token
    pos = F.array_position(F.transform(toks, lambda t: t.startswith(p).cast("int")), 1) - 1
    cand = (
        suggester.suggestions.withColumn("_pos", pos)
        .filter(F.col("_pos") >= 0)
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(int(n) * int(num_factor))
    )
    w = F.when(F.col("weight") == 0, F.lit(1)).otherwise(F.col("weight")).cast("double")
    w = F.when((w < 10.0) & (w > -10.0), w * 10.0).otherwise(w)  # 1/LINEAR_COEF pre-scale
    if blender == "position_linear":
        coef = F.lit(1.0) - F.lit(0.10) * F.col("_pos")
    elif blender == "position_reciprocal":
        coef = F.lit(1.0) / (F.lit(1.0) + F.col("_pos"))
    elif blender == "position_exponential_reciprocal":
        coef = F.lit(1.0) / F.pow(F.lit(1.0) + F.col("_pos"), F.lit(float(exponent)))
    else:
        raise ValueError(f"unknown blender {blender!r}")
    coef = F.when(F.col("key").startswith(p), F.lit(1.0)).otherwise(coef)
    return (
        cand.select("surface", (w * coef).cast("long").alias("score"))
        .orderBy(F.desc("score"), F.asc("surface"))
        .limit(int(n))
    )
