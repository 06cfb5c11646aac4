"""Solr DisMax query parser + multi-field dismax retrieval.

Reference: ``solr/core/src/java/org/apache/solr/search/DisMaxQParser.java``
(top-level assembly :95-215 — user query MUST + pf phrase SHOULD), and
``solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java`` —
``parseFieldBoosts`` (:parseFieldBoosts), ``setMinShouldMatch`` /
``calculateMinShouldMatch`` (:619-710, the conditional ``n<spec`` grammar with
float32 percent arithmetic and truncation toward zero).

Spark-first shape: every (word, field) leaf is one pruned postings scan of
that field's index; the per-word cross-field DisjunctionMax and the per-doc
SHOULD sum are two groupBy aggregations over matched rows only (map-side
combinable), never over the corpus.  The pf phrase clause joins in as a
broadcast-sized optional frame.  All float paths mirror Lucene:
f32(max + tie·(sum−max)) per dismax, f32(Σ double) per boolean sum, single
f32 cast at each query-tree node boundary.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..plans.query import PhraseQuery, Query, TermQuery


def parse_field_boosts(spec: str) -> dict[str, float]:
    """``SolrPluginUtils.parseFieldBoosts``: whitespace-split ``field^boost``
    entries; a missing ``^boost`` means 1.0 (represented as null there, a
    no-op boost here)."""
    out: dict[str, float] = {}
    for part in spec.split():
        if not part:
            continue
        name, _, b = part.partition("^")
        out[name] = float(b) if b else 1.0
    return out


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """Exact port of ``SolrPluginUtils.calculateMinShouldMatch`` (:669-710):
    conditional ``ub<spec`` chains evaluated left to right, percent specs via
    float32 ``(result·percent)·(1/100f)`` truncated toward zero, negative
    specs subtract, final clamp to [0, optionalClauseCount]."""
    n = optional_clause_count
    result = n
    spec = spec.strip()
    if "<" in spec:
        # (\s+<\s*)|(\s*<\s+) → "<" : collapse space around <, then split
        import re

        spec = re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
        for s in spec.split(" "):
            upper, _, sub = s.partition("<")
            if n <= int(upper):
                return result
            result = calculate_min_should_match(n, sub)
        return result
    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = float(np.float32(np.float32(result * percent) * np.float32(1.0 / 100.0)))
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return n if n < result else (0 if result < 0 else result)


def _dismax_combine(parts: list[DataFrame], tie: float) -> DataFrame:
    """f32(max + tie·(sum − max)) over per-field frames, accumulated in
    double — identical arithmetic to ``IndexSearcher._eval_dismax``."""
    if len(parts) == 1 and tie == 0.0:
        # single disjunct: DisjunctionMaxQuery of one clause scores as the
        # clause itself (max == sum)
        return parts[0]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy("doc_id").agg(
        F.max(F.col("score").cast("double")).alias("m"),
        F.sum(F.col("score").cast("double")).alias("s"),
    )
    return agg.select(
        "doc_id",
        (F.col("m") + F.lit(float(tie)) * (F.col("s") - F.col("m"))).cast("float").alias("score"),
    )


def _word_query(analyzer, word: str, slop: int = 0) -> Optional[Query]:
    toks = analyzer.tokens(word)
    if not toks:
        return None
    if len(toks) == 1:
        return TermQuery(toks[0])
    return PhraseQuery(tuple(toks), slop=slop)


def _shingled_phrase_frame(
    field_searchers: dict,
    fields: dict[str, float],
    words: list[str],
    shingle_size: int,
    slop: int,
    tie: float,
) -> Optional[DataFrame]:
    """eDisMax ``addShingledPhraseQueries`` (``ExtendedDismaxQParser.java:
    602-667``): every window of ``shingle_size`` consecutive user words
    becomes a phrase DisjunctionMax over the pf fields (makeDismax=true,
    :652); the windows join as SHOULD clauses of one boolean — per-doc
    f32(Σ double) over matching windows.  ``shingle_size == 0`` means the
    whole query (the classic pf), per ``:614``.  Returns None when the query
    is shorter than the shingle (``:610-611``) or nothing matches."""
    if shingle_size and len(words) < shingle_size:
        return None
    size = shingle_size or len(words)
    if size < 2:
        return None  # minClauseSize = 2 (:659): no single-term phrase boost
    window_frames: list[DataFrame] = []
    for i in range(len(words) - size + 1):
        parts = []
        for f, boost in fields.items():
            s = field_searchers[f]
            q = _word_query(s.index.config.analyzer, " ".join(words[i : i + size]), slop=slop)
            if q is None or isinstance(q, TermQuery):
                continue
            stats = s._term_stats(q.terms())
            parts.append(s._evaluate(q, float(boost), stats).select("doc_id", "score"))
        if parts:
            window_frames.append(_dismax_combine(parts, tie))
    if not window_frames:
        return None
    if len(window_frames) == 1:
        return window_frames[0]
    u = window_frames[0]
    for fr in window_frames[1:]:
        u = u.unionByName(fr)
    return u.groupBy("doc_id").agg(
        F.sum(F.col("score").cast("double")).cast("float").alias("score")
    )


def split_into_clauses(s: str) -> list:
    """eDisMax ``splitIntoClauses`` (``ExtendedDismaxQParser.java:722-848``),
    the subset our engine evaluates: whitespace-separated clauses, a leading
    ``+``/``-`` binds as the occur operator (a bare ``+``/``-`` with no value
    is literal text and drops), ``"..."`` groups a phrase with an optional
    ``~N`` slop suffix.  Returns ``(must, text, is_phrase, slop)`` tuples
    where ``must`` is '+', '-' or ''."""
    out = []
    i, n = 0, len(s)
    while i < n:
        if s[i].isspace():
            i += 1
            continue
        must = ""
        if s[i] in "+-" and i + 1 < n and not s[i + 1].isspace():
            must = s[i]
            i += 1
        if i < n and s[i] == '"':
            j = s.find('"', i + 1)
            if j == -1:
                i += 1  # unmatched quote: extraneous, keep scanning
                continue
            text = s[i + 1 : j]
            i = j + 1
            slop = 0
            if i < n and s[i] == "~":
                k = i + 1
                while k < n and s[k].isdigit():
                    k += 1
                if k > i + 1:
                    slop = int(s[i + 1 : k])
                i = k
            if text.strip():
                out.append((must, text, True, slop))
        else:
            j = i
            while j < n and not s[j].isspace():
                j += 1
            text = s[i:j]
            i = j
            if text:
                out.append((must, text, False, 0))
    return out


def edismax_search(
    field_searchers: dict,
    query_str: str,
    qf: dict[str, float],
    tie: float = 0.0,
    mm: str = "100%",
    pf: Optional[dict[str, float]] = None,
    ps: int = 0,
    pf2: Optional[dict[str, float]] = None,
    ps2: Optional[int] = None,
    pf3: Optional[dict[str, float]] = None,
    ps3: Optional[int] = None,
    bq: Optional[list] = None,
    bf: Optional[list] = None,
    k: int = 10,
) -> DataFrame:
    """ExtendedDismaxQParser main-query semantics
    (``ExtendedDismaxQParser.java:140-330``): the user query is split into
    clauses (``+``=MUST, ``-``=MUST_NOT, bare=SHOULD, quoted=phrase with
    optional ``~N``); each non-negated clause scores as a cross-field
    DisjunctionMax over qf; MUST clauses are required, mm applies to the
    SHOULD clause count (``setMinShouldMatch``), MUST_NOT clauses anti-join
    and never score; pf/pf2/pf3 shingle windows form over the BARE words
    only (``Clause.isBareWord``, :705-712).  Scores: f32(Σ double) over the
    matching MUST+SHOULD clause scores at the user-query node, then the
    boost clauses add exactly as in :func:`dismax_search`."""
    clauses = split_into_clauses(query_str)
    if not clauses:
        return next(iter(field_searchers.values()))._empty()

    def clause_frame(text: str, is_phrase: bool, slop: int) -> Optional[DataFrame]:
        parts = []
        for f, boost in qf.items():
            s = field_searchers[f]
            q = _word_query(s.index.config.analyzer, text, slop=slop)
            if q is None:
                continue
            stats = s._term_stats(q.terms())
            parts.append(s._evaluate(q, float(boost), stats).select("doc_id", "score"))
        return _dismax_combine(parts, tie) if parts else None

    must_frames, should_frames, not_frames = [], [], []
    bare_words = []
    for must, text, is_phrase, slop in clauses:
        fr = clause_frame(text, is_phrase, slop)
        if must == "-":
            if fr is not None:
                not_frames.append(fr.select("doc_id"))
            continue
        if fr is None:
            continue  # unanalyzable positive clause: no-op (df=0 handled below)
        (must_frames if must == "+" else should_frames).append(fr)
        if must == "" and not is_phrase:
            bare_words.extend(text.replace('"', "").split())
    if not must_frames and not should_frames:
        return next(iter(field_searchers.values()))._empty()

    frames = [
        fr.select("doc_id", "score", F.lit(i).alias("__c"), F.lit(i < len(must_frames)).alias("__m"))
        for i, fr in enumerate(must_frames + should_frames)
    ]
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    agg = u.groupBy("doc_id").agg(
        F.sum(F.col("score").cast("double")).alias("__d"),
        F.sum(F.when(F.col("__m"), 1).otherwise(0)).alias("__nm"),
        F.sum(F.when(~F.col("__m"), 1).otherwise(0)).alias("__ns"),
    )
    if must_frames:
        agg = agg.filter(F.col("__nm") == len(must_frames))
    if should_frames:
        msm = calculate_min_should_match(len(should_frames), mm)
        if must_frames:
            # with required clauses present, SHOULD needs only msm (may be 0)
            if msm > 0:
                agg = agg.filter(F.col("__ns") >= msm)
        else:
            agg = agg.filter(F.col("__ns") >= max(1, msm))
    main = agg.select("doc_id", F.col("__d").cast("float").alias("__m"))
    for nf in not_frames:
        main = main.join(nf, "doc_id", "left_anti")

    optional: list[DataFrame] = []
    for fields, size, sl in (
        (pf, 0, ps),
        (pf2, 2, ps if ps2 is None else ps2),
        (pf3, 3, ps if ps3 is None else ps3),
    ):
        if fields and bare_words:
            fr = _shingled_phrase_frame(field_searchers, fields, bare_words, size, sl, tie)
            if fr is not None:
                optional.append(fr)
    for f, q, boost in bq or ():
        s = field_searchers[f]
        stats = s._term_stats(q.terms())
        optional.append(s._evaluate(q, float(boost), stats).select("doc_id", "score"))
    for f, src, boost in bf or ():
        s = field_searchers[f]
        if s.corpus is None:
            raise ValueError("bf boost functions need IndexSearcher(corpus=...)")
        from ..plans.function_queries import FunctionContext, compile_function

        ctx = FunctionContext(s)
        col = compile_function(src, ctx)
        frame = s.corpus.withColumnRenamed(s.index.config.id_col, "doc_id")
        for aux in ctx.joins.values():
            frame = frame.join(aux, "doc_id", "left")
        optional.append(
            frame.select(
                "doc_id",
                (F.lit(float(boost)) * col.cast("double")).cast("float").alias("score"),
            )
        )
    acc = F.col("__m").cast("double")
    for i, fr in enumerate(optional):
        col_name = f"__o{i}"
        main = main.join(fr.withColumnRenamed("score", col_name), "doc_id", "left")
        acc = acc + F.coalesce(F.col(col_name).cast("double"), F.lit(0.0))
    main = main.select("doc_id", acc.cast("float").alias("score"))
    return main.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def dismax_search(
    field_searchers: dict,
    query_str: str,
    qf: dict[str, float],
    tie: float = 0.0,
    mm: str = "100%",
    pf: Optional[dict[str, float]] = None,
    ps: int = 0,
    pf2: Optional[dict[str, float]] = None,
    ps2: Optional[int] = None,
    pf3: Optional[dict[str, float]] = None,
    ps3: Optional[int] = None,
    bq: Optional[list] = None,
    bf: Optional[list] = None,
    k: int = 10,
) -> DataFrame:
    """DisMaxQParser.parse + search (+ the eDisMax pf2/pf3/bq surface):
    whitespace-split user words, each word a cross-field DisjunctionMax
    (``addMainQuery``, tie from ``tie``), mm applied to the word count
    (``getUserQuery`` → ``setMinShouldMatch``); optional SHOULD clauses —

    - ``pf``/``ps``: whole user query as a phrase DisjunctionMax
      (``getPhraseQuery:228-240``; quotes stripped first)
    - ``pf2``/``pf3`` (+ ``ps2``/``ps3``, defaulting to ``ps``): bigram /
      trigram shingled phrase boosts (``ExtendedDismaxQParser.java:291-330``)
    - ``bq``: extra boost queries as ``(field, Query, boost)`` triples
      (``DisMaxQParser.addBoostQuery:171-197``)
    - ``bf``: additive boost functions as ``(field, func_src, boost)``
      triples (``DisMaxQParser.addBoostFunctions:158-169``; func_src uses the
      ValueSourceParser registry, e.g. ``recip(n_chars,1,1000,1000)``); the
      FunctionQuery matches every doc, so it contributes to every main hit —
      ``f32(f64(boost) · f64(value))`` per doc

    all summed with the mm-filtered main clause in ONE double accumulation
    with a single final f32 cast (Lucene's BooleanScorer sum).

    ``field_searchers`` maps field name → IndexSearcher over that field's
    index; every referenced field must be present.  Returns the top-k
    ``(doc_id, score)`` ordered (score desc, doc_id asc)."""
    words = query_str.replace('"', "").split()
    # ONE pruned postings scan per qf field for every single-token word
    # (the batched-retrieval plan shape: terms IN (...) → per-term scores in
    # one pass), instead of one scan per (word, field).  Multi-token words
    # (field analyzers may split) fall back to per-word phrase evaluation.
    leaf_frames: list[DataFrame] = []  # (doc_id, score, __w)
    # a word is an mm-countable SHOULD clause as soon as some field's
    # analyzer produces tokens for it — a df=0 term still forms a clause
    # (DisjunctionMaxQueryParser parses it; it just never matches)
    clause_words: set[int] = set()
    for f, boost in qf.items():
        s = field_searchers[f]
        tok_by_word: dict[int, str] = {}
        for i, w in enumerate(words):
            toks = s.index.config.analyzer.tokens(w)
            if len(toks) == 1:
                tok_by_word[i] = toks[0]
                clause_words.add(i)
            elif len(toks) > 1:
                clause_words.add(i)
                q = PhraseQuery(tuple(toks))
                stats = s._term_stats(q.terms())
                leaf_frames.append(
                    s._evaluate(q, float(boost), stats)
                    .select("doc_id", "score", F.lit(i).alias("__w"))
                )
        terms = set(tok_by_word.values())
        if not terms:
            continue
        stats = s._term_stats(terms)
        weights = {t: s._leaf_w(float(boost), t, stats) for t in terms if t in stats}
        if not weights:
            continue
        by_term: dict[str, list[int]] = {}
        for i, t in tok_by_word.items():
            if t in weights:
                by_term.setdefault(t, []).append(i)
        word_map = F.map_from_arrays(
            F.array(*[F.lit(t) for t in by_term]),
            F.array(*[F.array(*[F.lit(i) for i in idxs]) for idxs in by_term.values()]),
        )
        leaf_frames.append(
            s._scored_postings(weights)
            .select("doc_id", "score", F.explode(word_map[F.col("term")]).alias("__w"))
        )
    if not leaf_frames:
        return next(iter(field_searchers.values()))._empty()

    msm = calculate_min_should_match(len(clause_words), mm)
    u = leaf_frames[0]
    for fr in leaf_frames[1:]:
        u = u.unionByName(fr)
    # per-word cross-field DisjunctionMax, then the SHOULD sum — two aggs
    # over matched rows only, both map-side combinable
    dmx = u.groupBy("doc_id", "__w").agg(
        F.max(F.col("score").cast("double")).alias("m"),
        F.sum(F.col("score").cast("double")).alias("s"),
    )
    per_word = dmx.select(
        "doc_id",
        (F.col("m") + F.lit(float(tie)) * (F.col("s") - F.col("m"))).cast("float").alias("score"),
    )
    main = per_word.groupBy("doc_id").agg(
        F.sum(F.col("score").cast("double")).alias("__d"),
        F.count("*").alias("__nc"),
    )
    if msm > 1:
        main = main.filter(F.col("__nc") >= msm)
    # the user-query boolean is its own query-tree node: f32 cast here,
    # before the outer sum with the SHOULD clauses (BooleanScorer boundary)
    main = main.select("doc_id", F.col("__d").cast("float").alias("__m"))

    optional: list[DataFrame] = []
    for fields, size, sl in (
        (pf, 0, ps),
        (pf2, 2, ps if ps2 is None else ps2),
        (pf3, 3, ps if ps3 is None else ps3),
    ):
        if fields:
            fr = _shingled_phrase_frame(field_searchers, fields, words, size, sl, tie)
            if fr is not None:
                optional.append(fr)
    for f, q, boost in bq or ():
        s = field_searchers[f]
        stats = s._term_stats(q.terms())
        optional.append(s._evaluate(q, float(boost), stats).select("doc_id", "score"))
    for f, src, boost in bf or ():
        s = field_searchers[f]
        if s.corpus is None:
            raise ValueError("bf boost functions need IndexSearcher(corpus=...)")
        from ..plans.function_queries import FunctionContext, compile_function

        ctx = FunctionContext(s)
        col = compile_function(src, ctx)
        frame = s.corpus.withColumnRenamed(s.index.config.id_col, "doc_id")
        for aux in ctx.joins.values():
            frame = frame.join(aux, "doc_id", "left")
        optional.append(
            frame.select(
                "doc_id",
                (F.lit(float(boost)) * col.cast("double")).cast("float").alias("score"),
            )
        )

    acc = F.col("__m").cast("double")
    for i, fr in enumerate(optional):
        col = f"__o{i}"
        main = main.join(fr.withColumnRenamed("score", col), "doc_id", "left")
        acc = acc + F.coalesce(F.col(col).cast("double"), F.lit(0.0))
    main = main.select("doc_id", acc.cast("float").alias("score"))
    return main.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
