"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Each entry pairs a Spark evaluation (through the real engine:
``build_index`` → ``IndexSearcher``) with an independent ANSI-SQL
re-derivation runnable by DuckDB on the same parquet tables.  The SQL emulates
the engine's float32 BM25 semantics (reference BM25Similarity.java:188-226)
with explicit ``CAST(... AS REAL)`` at every float32 operation and reproduces
the SmallFloat byte4 norm quantization (reference SmallFloat.java:101-169)
arithmetically, so rank order matches bit-for-bit.

Output columns are integer (rank, doc_id) so value-hash comparison is
float-free; scores are checked separately by the pytest oracle suite.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .contract_pipeline import (  # noqa: F401 — re-exported for __spark_entry__
    agg_oracle_sql,
    agg_queries,
    pipeline_oracle_sql,
    pipeline_queries,
)
from .functions.analysis import simple_analyzer
from .functions.similarities import (
    AfterEffectB,
    AxiomaticF1EXPSimilarity,
    AxiomaticF2EXPSimilarity,
    AxiomaticF2LOGSimilarity,
    AxiomaticF3LOGSimilarity,
    BasicModelG,
    BasicModelIF,
    BooleanSimilarity,
    ClassicSimilarity,
    DFIChiSquaredSimilarity,
    DFISimilarity,
    DFRInL2Similarity,
    DFRSimilarity,
    DistributionSPL,
    IBLLSimilarity,
    IBSimilarity,
    IndependenceSaturated,
    LambdaTTF,
    LegacyBM25Similarity,
    LMDirichletSimilarity,
    MultiSimilarity,
    LMJelinekMercerSimilarity,
    NormalizationH1,
    NormalizationH2,
    SweetSpotSimilarity,
)
from .operators.indexer import IndexConfig, build_index
from .operators.searcher import IndexSearcher
from .plans.parser import parse_query
from .plans.query import (
    BlendedTermQuery,
    BooleanQuery,
    CommonTermsQuery,
    ConstantScoreQuery,
    CoveringQuery,
    DisjunctionMaxQuery,
    FieldRangeQuery,
    FieldTermQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    PhraseQuery,
    BoostQuery,
    PrefixQuery,
    RegexpQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanPositionRangeQuery,
    SpanContainingQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanWithinQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

# ----------------------------------------------------------- index caching
_INDEX_CACHE: dict = {}


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    """Build (once per sf_dir) the inverted index over `documents`."""
    key = ("documents", sf_dir)
    if key not in _INDEX_CACHE:
        raw = _load(spark, sf_dir, "documents")
        corpus = raw.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            *[c for c in raw.columns if c != "doc_id"],
        )
        corpus = corpus.persist()
        idx = build_index(
            corpus, IndexConfig(analyzer=simple_analyzer(), n_partitions=8, index_positions=True)
        ).persist()
        _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
    return _INDEX_CACHE[key]


def golden_searcher(spark: SparkSession) -> IndexSearcher:
    """The reference span-test corpus (``reference lucene/core/src/test/org/
    apache/lucene/search/spans/TestBasics.java:60-75``): doc i = English.
    intToEnglish(i) for i in 0..1999, letters-only lowercase tokens
    (MockTokenizer.SIMPLE ≡ simple_analyzer on this corpus — no stopwords or
    non-letter token chars occur), positions indexed.  doc_id == i, so the
    reference's checkHits arrays compare directly."""
    key = ("golden_english",)
    if key not in _INDEX_CACHE:
        import pandas as pd

        from .functions.span_golden_data import int_to_english

        pdf = pd.DataFrame(
            {"doc_id": range(2000), "text": [int_to_english(i) for i in range(2000)]}
        )
        corpus = (
            spark.createDataFrame(pdf)
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
            .repartition(8)
            .persist()
        )
        idx = build_index(
            corpus,
            IndexConfig(analyzer=simple_analyzer(), n_partitions=8, index_positions=True),
        ).persist()
        _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
    return _INDEX_CACHE[key]


def tiny_searcher(spark: SparkSession, tag: str, texts, analyzer=None) -> IndexSearcher:
    """Positional index over a reference test fixture corpus (doc_id = list
    position), cached per tag — the shared plumbing behind the golden-vector
    rows that rebuild a reference test's own documents."""
    key = ("golden_tiny", tag)
    if key not in _INDEX_CACHE:
        import pandas as pd

        pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": list(texts)})
        corpus = (
            spark.createDataFrame(pdf)
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
            .repartition(2)
            .persist()
        )
        idx = build_index(
            corpus,
            IndexConfig(
                analyzer=analyzer or simple_analyzer(),
                n_partitions=2,
                index_positions=True,
            ),
        ).persist()
        _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
    return _INDEX_CACHE[key]


def alt_searcher(spark: SparkSession, sf_dir: str, tag: str, analyzer) -> IndexSearcher:
    """Secondary `documents` index under a different analysis chain
    (shingles / synonyms), cached per (tag, sf_dir)."""
    key = ("documents", sf_dir, tag)
    if key not in _INDEX_CACHE:
        corpus = doc_searcher(spark, sf_dir).corpus  # shares the persisted corpus
        idx = build_index(corpus, IndexConfig(analyzer=analyzer, n_partitions=8)).persist()
        _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
    return _INDEX_CACHE[key]


def wdgf_searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    """`documents` with adjacent token pairs '-'-joined ("scan merge key" ->
    "scan-merge key"), indexed under WhitespaceTokenizer →
    WordDelimiterGraphFilter(GENERATE_* | SPLIT_* | STEM | CATENATE_WORDS) →
    LowerCaseFilter (functions/worddelimiter.py — ``reference lucene/
    analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java``).

    The generated parts restore the ORIGINAL unigram stream exactly (same
    tf/df/positions, and dl counts occupied graph positions so catenations
    are discounted overlaps) — which is what the float32-exact oracle leans
    on: unigram stats come from the untransformed text, catenated-term stats
    from the odd-boundary pair join."""
    key = ("documents", sf_dir, "wdgf")
    if key not in _INDEX_CACHE:
        from .functions.analysis import wdgf_analyzer
        from .functions.worddelimiter import CATENATE_WORDS, WDGF_DEFAULT_FLAGS

        corpus = (
            doc_searcher(spark, sf_dir)
            .corpus.withColumn(
                "text", F.regexp_replace("text", r"([a-z0-9]+) ([a-z0-9]+)", r"$1-$2")
            )
            .persist()
        )
        idx = build_index(
            corpus,
            IndexConfig(
                analyzer=wdgf_analyzer(WDGF_DEFAULT_FLAGS | CATENATE_WORDS), n_partitions=8
            ),
        ).persist()
        _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
    return _INDEX_CACHE[key]


def _ranked(top_df: DataFrame) -> DataFrame:
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top_df.select(F.row_number().over(w).cast("int").alias("rank"), F.col("doc_id").cast("long"))


def _search_q(query, k=10):
    def fn(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return _ranked(s.search(query, k).df)

    return fn


# ----------------------------------------------------- float32-exact SQL gen
def _R(x: str) -> str:
    return f"CAST({x} AS REAL)"


def _D(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


# shared CTEs over `documents`: tokens, lengths, byte4-quantized lengths,
# collection stats, tf, df — the tokenizer expression is definitionally
# identical to simple_analyzer() (analysis.py)
_BASE = """
tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
dlq AS (SELECT doc_id, CASE WHEN dl < 24 THEN dl
        ELSE 24 + (CASE WHEN dl-24 < 8 THEN dl-24
                   ELSE ((dl-24) >> (length(bin(dl-24))-4)) << (length(bin(dl-24))-4) END)
        END AS dlq FROM dl),
st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
              (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) AS sttf),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""

_AVGDL = _R("(SELECT sttf FROM st) / (SELECT n FROM st)")
# cache[dlq] = k1*((1-b) + b*len/avgdl), every op float32 (BM25Similarity.java:188-192)
_C1 = _R(_R("0.75") + " * " + _R("dlq.dlq"))  # b * LENGTH_TABLE[i]
_C2 = _R(_C1 + " / " + _AVGDL)  # ... / avgdl
_C3 = _R(_R("0.25") + " + " + _C2)  # (1-b) + ...
_CACHE = _R(_R("1.2") + " * " + _C3)  # k1 * ...


def _idf(df_expr: str) -> str:
    # (float) ln(1 + (N - df + 0.5)/(df + 0.5))  (BM25Similarity.java:70-72)
    return _R(f"ln(1 + ((SELECT n FROM st) - {df_expr} + 0.5) / ({df_expr} + 0.5))")


def _term_cte(alias: str, term: str) -> str:
    # score = weight_f32 * (float)(tf / (tf + (double) cache))  (:222-226)
    t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    score = _R(f"{_idf('dfreq.df')} * {t32}")
    return (
        f"{alias} AS (SELECT tf.doc_id AS doc_id, {score} AS score "
        f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
        f"WHERE tf.term = '{term}')"
    )


def _topk_sql(body: str, k: int = 10) -> str:
    return (
        f"SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"CAST(doc_id AS BIGINT) AS doc_id FROM ({body}) ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def _with(ctes: list, final: str) -> str:
    return "WITH " + _BASE.strip().rstrip(",") + (",\n" + ",\n".join(ctes) if ctes else "") + "\n" + final


# fixed query terms, present at every scale factor of the documents table
HOT, HOT2, MID, MID2, RARE = "scan", "merge", "key", "sort", "dup"

# fixed targets for the kNN-classifier contract query
KNN_TARGETS = (7, 11, 23, 42)

# unseen inputs for the fuzzy-kNN contract query (deliberate misspellings of
# dictionary terms, plus one exact term to exercise the df_src > 0 path)
KNN_FUZZY_TEXTS = ("scann merg", "keey stream", "sortt dupp")

# FuzzyLikeThisQuery contract input (maxEdits=2 suffix distances)
FLT_TEXT = "scann keey"

# concave pentagon + rectangular hole for the polygon contract query —
# vertices shared verbatim by the Spark predicate and the SQL oracle
POLY_LATS = [-50.0, 60.0, -10.0, 60.0, -50.0]
POLY_LONS = [-120.0, -80.0, 0.0, 80.0, 120.0]
POLY_HOLE = ([-30.0, -10.0, -10.0, -30.0], [-20.0, -20.0, 20.0, 20.0])


# --------------------------------------------------------------- registry
def ft_queries() -> dict:
    q: dict = {}

    q["ft_term_topk"] = _search_q(TermQuery(HOT))
    q["ft_term_rare_topk"] = _search_q(TermQuery(RARE))

    def ft_distributed_topk(spark, sf_dir):
        """Sharded search with global statistics (ExactStatsCache +
        two-phase merge): the doc index split into 3 doc-range shards via
        split_index, searched through MultiIndexSearcher — bit-identical to
        the undivided index, so the oracle is the plain term top-k."""
        from .operators.distributed import MultiIndexSearcher
        from .operators.merge import split_index

        s = doc_searcher(spark, sf_dir)
        key = ("sharded", sf_dir)
        if key not in _INDEX_CACHE:
            n = s.index.doc_count
            parts = split_index(s.index, [n // 3, 2 * n // 3])
            _INDEX_CACHE[key] = MultiIndexSearcher(parts, corpus=s.corpus)
        return _ranked(_INDEX_CACHE[key].search(TermQuery(HOT), 10).df)

    q["ft_distributed_topk"] = ft_distributed_topk

    def ft_bloom_topk(spark, sf_dir):
        """BloomFilteringPostingsFormat analog (``reference lucene/codecs/...
        /bloom/BloomFilteringPostingsFormat.java``): the same rare-term BM25
        top-k evaluated through per-run FuzzySet pruning — bloom NO is
        definitive, so results are bit-identical to the unpruned scan."""
        from .operators.bloom import build_term_blooms

        s = doc_searcher(spark, sf_dir)
        key = ("blooms", sf_dir)
        if key not in _INDEX_CACHE:
            b = build_term_blooms(s.index).persist()
            b.count()
            _INDEX_CACHE[key] = b
        top = s.set_term_blooms(_INDEX_CACHE[key]).search(TermQuery(MID2), 10)
        s.set_term_blooms(None)
        return _ranked(top.df)

    q["ft_bloom_topk"] = ft_bloom_topk
    q["ft_bool_and"] = _search_q(BooleanQuery.build(must=[TermQuery(HOT), TermQuery(HOT2)]))
    q["ft_bool_or"] = _search_q(BooleanQuery.build(should=[TermQuery(MID), TermQuery(RARE)]))
    q["ft_minshouldmatch"] = _search_q(
        BooleanQuery.build(should=[TermQuery(HOT), TermQuery(MID), TermQuery(RARE)], minimum_should_match=2)
    )
    q["ft_must_not"] = _search_q(BooleanQuery.build(must=[TermQuery(RARE)], must_not=[TermQuery(HOT)]))
    q["ft_phrase"] = _search_q(PhraseQuery((HOT, HOT2)))
    q["ft_synonym"] = _search_q(SynonymQuery((MID, MID2)))
    q["ft_dismax"] = _search_q(DisjunctionMaxQuery((TermQuery(MID), TermQuery(RARE)), tie_breaker=0.3))
    q["ft_blended"] = _search_q(
        BlendedTermQuery(blend_terms=(MID, RARE), term_boosts=(1.0, 2.0))
    )

    def ft_prefix(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        top = s.search(ConstantScoreQuery(PrefixQuery("sc")), 20)
        return top.df.select(F.col("doc_id").cast("long")).orderBy("doc_id")

    q["ft_prefix"] = ft_prefix

    def ft_count(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        n = s.count(TermQuery(HOT))
        return spark.createDataFrame([(n,)], "cnt bigint")

    q["ft_count"] = ft_count

    def ft_stats(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return spark.createDataFrame(
            [(s.index.doc_count, s.index.sum_ttf)], "doc_count bigint, sum_ttf bigint"
        )

    q["ft_stats"] = ft_stats

    def ft_terms_stats(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        terms = [HOT, HOT2, MID, MID2, RARE]
        return (
            s.index.terms.filter(F.col("term").isin(terms))
            .select("term", F.col("df").cast("long"), F.col("ttf").cast("long"))
            .orderBy("term")
        )

    q["ft_terms_stats"] = ft_terms_stats

    # ---- MultiTermQuery family (constant-score doc-id sets)
    def _const_ids(query, limit=30):
        def fn(spark, sf_dir):
            s = doc_searcher(spark, sf_dir)
            top = s.search(ConstantScoreQuery(query), limit)
            return top.df.select(F.col("doc_id").cast("long")).orderBy("doc_id")

        return fn

    def _const_ids_xml(xml, limit=30):
        def fn(spark, sf_dir):
            from .plans.xml_parser import parse_xml_query

            return _const_ids(parse_xml_query(xml, simple_analyzer()), limit)(spark, sf_dir)

        return fn

    q["ft_wildcard"] = _const_ids(WildcardQuery("s?an"))
    q["ft_regexp"] = _const_ids(RegexpQuery("s[ck]an|sort"))
    q["ft_term_range"] = _const_ids(TermRangeQuery("scan", "sort", True, False))
    q["ft_term_in_set"] = _const_ids(TermInSetQuery((HOT, MID2, RARE)))
    q["ft_fuzzy"] = _const_ids(FuzzyQuery("scann", 1))
    # default scoring rewrite: TopTermsBlendedFreq (FuzzyQuery.java:100)
    q["ft_fuzzy_scored"] = _search_q(FuzzyQuery("scann", 2))

    def ft_mlt(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        mlt_q = s.more_like_this(7, max_query_terms=5)
        return _ranked(s.search(mlt_q, 10, exclude_doc_ids=[7]).df)

    q["ft_mlt"] = ft_mlt

    def ft_group_topk(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.group_topk(TermQuery(HOT), "lang", 2).select("lang", "rank", F.col("doc_id").cast("long")).orderBy(
            "lang", "rank"
        )

    q["ft_group_topk"] = ft_group_topk

    def ft_facet_lang(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.facet(TermQuery(HOT), "lang").orderBy("lang")

    q["ft_facet_lang"] = ft_facet_lang

    def ft_highlight(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        top = s.search(TermQuery(HOT), 10)
        return s.highlight(top, HOT).select(F.col("doc_id").cast("long"), "snippet").orderBy("doc_id")

    q["ft_highlight"] = ft_highlight

    def ft_rescore(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        top = s.search(TermQuery(HOT), 20)
        return _ranked(s.rescore(top, TermQuery(HOT2), weight=2.0))

    q["ft_rescore"] = ft_rescore

    def ft_function_score(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return _ranked(s.function_score(TermQuery(HOT), "ln(1 + n_chars)", 10).df)

    q["ft_function_score"] = ft_function_score

    def ft_export_sorted(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        out = s.sorted_export(TermQuery(MID), [F.desc("n_chars"), F.asc("doc_id")])
        return out.select(F.col("doc_id").cast("long"), F.col("n_chars").cast("long"))

    q["ft_export_sorted"] = ft_export_sorted

    def ft_suggest(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.suggest("sc", 10)

    q["ft_suggest"] = ft_suggest

    def ft_significant(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.significant_terms(TermQuery(RARE), n=10, min_df=5)

    q["ft_significant"] = ft_significant

    def ft_blockjoin(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.parent_block_join(TermQuery(RARE), "source").orderBy("parent")

    q["ft_blockjoin"] = ft_blockjoin

    def ft_phrase_sloppy(spark, sf_dir):
        """Sloppy PhraseQuery (``reference lucene/core/src/java/org/apache/
        lucene/search/SloppyPhraseMatcher.java``): slop-2 two-term phrase,
        float32 freq = Σ 1/(1+matchLength) over the matcher walk.  The oracle
        replays the two-stream min-queue walk as a recursive CTE — an
        independent SQL re-derivation of the procedural matcher, fuzz-pinned
        against the engine on 5000 random position configurations."""
        s = doc_searcher(spark, sf_dir)
        return _ranked(s.search(PhraseQuery((HOT, HOT2), slop=2), 10).df)

    q["ft_phrase_sloppy"] = ft_phrase_sloppy

    def ft_get(spark, sf_dir):
        """RealTimeGetComponent analog: stored-field point lookup by doc id
        (Catalyst pushes the id predicate to the parquet scan)."""
        s = doc_searcher(spark, sf_dir)
        return s.corpus.filter(F.col("doc_id").isin([7, 42, 123])).select(
            F.col("doc_id").cast("long"), "text", "lang"
        ).orderBy("doc_id")

    q["ft_get"] = ft_get

    # ---- span queries (search/spans/*, NearSpansOrdered / NearSpansUnordered)
    q["ft_span_near"] = _const_ids(SpanNearQuery((HOT, HOT2), slop=2, in_order=True))

    def ft_complex_phrase(spark, sf_dir):
        """ComplexPhraseQueryParser: '"merge s*"' — wildcard slot expanded
        against the term dictionary into a SpanOr, ordered adjacency."""
        s = doc_searcher(spark, sf_dir)
        cq = s.complex_phrase_query(f"{HOT2} s*", slop=0)
        top = s.search(ConstantScoreQuery(cq), 30)
        return top.df.select(F.col("doc_id").cast("long")).orderBy("doc_id")

    q["ft_complex_phrase"] = ft_complex_phrase
    q["ft_span_near_unordered"] = _const_ids(SpanNearQuery((MID, HOT), slop=3, in_order=False))
    # n-ary NearSpansUnordered window (one span per clause, any order)
    q["ft_span_near_unordered3"] = _const_ids(
        SpanNearQuery((HOT, MID, MID2), slop=4, in_order=False)
    )

    def _surround(expr: str, limit=30):
        """Surround query language (queryparser/surround/parser/QueryParser.jj)
        through parse_surround — constant-score id sets."""

        def fn(spark, sf_dir):
            from .plans.surround_parser import parse_surround

            s = doc_searcher(spark, sf_dir)
            top = s.search(ConstantScoreQuery(parse_surround(expr)), limit)
            return top.df.select(F.col("doc_id").cast("long")).orderBy("doc_id")

        return fn

    # infix W + unordered N + top-level OR; nested left-associative W chain
    q["ft_surround"] = _surround(f"({HOT} 3W {HOT2}) OR ({MID} N {MID2})")
    q["ft_surround_nested"] = _surround(f"({HOT} w {HOT2}) 4w {MID}")
    # span algebra: first / not / or-as-near-clause (search/spans/*)
    q["ft_span_first"] = _const_ids(SpanFirstQuery(HOT, 3))
    q["ft_span_not"] = _const_ids(SpanNotQuery(MID, HOT, pre=1, post=1))
    q["ft_span_or_near"] = _const_ids(SpanNearQuery(((MID, MID2), HOT), slop=2, in_order=True))
    # span containment (SpanContainingQuery / SpanWithinQuery)
    q["ft_span_containing"] = _const_ids(
        SpanContainingQuery(SpanNearQuery((HOT, HOT2), slop=6, in_order=True), MID)
    )
    q["ft_span_within"] = _const_ids(
        SpanWithinQuery(SpanNearQuery((HOT, HOT2), slop=6, in_order=True), MID)
    )
    # multi-phrase: per-slot synonym alternatives (MultiPhraseQuery.java)
    q["ft_multiphrase"] = _search_q(MultiPhraseQuery(((HOT,), (HOT2, MID2))))

    # ---- reference golden vectors: the TestBasics corpus + checkHits
    # literals (``reference lucene/core/src/test/org/apache/lucene/search/
    # spans/TestBasics.java:60-432``).  The Spark side rebuilds the
    # reference's deterministic corpus (doc i = English.intToEnglish(i),
    # functions/span_golden_data.py) and runs OUR engine; the oracle is a
    # pure VALUES list of the reference's own expected hit arrays — the
    # engine never reads those literals, so agreement pins the operator
    # against the reference's documented behavior, not a builder
    # re-derivation.  Loud-fail: any extra/missing hit is a row-count +
    # hash mismatch against the transcribed array.
    def _golden_cases(cases):
        def fn(spark, sf_dir):
            s = golden_searcher(spark)
            out = None
            for vname, query in cases:
                ids = (
                    s.search(ConstantScoreQuery(query), 2000)
                    .df.select(
                        F.lit(vname).alias("variant"), F.col("doc_id").cast("long")
                    )
                    .distinct()
                )
                out = ids if out is None else out.unionByName(ids)
            return out.orderBy("variant", "doc_id")

        return fn

    q["ft_golden_term_phrase_bool"] = _golden_cases([
        ("term_seventy", TermQuery("seventy")),
        ("phrase_seventy_seven", PhraseQuery(("seventy", "seven"), slop=0)),
        ("bool_seventy_seven",
         BooleanQuery.build(must=[TermQuery("seventy"), TermQuery("seven")])),
    ])
    # testSpanOr is a SpanOr over two SpanNears; document-level that is the
    # union of the two near matches (SpanOrQuery.java doc semantics)
    q["ft_golden_span_near"] = _golden_cases([
        ("near_exact_seventy_seven",
         SpanNearQuery(("seventy", "seven"), slop=0, in_order=True)),
        ("near_ordered_nine_six",
         SpanNearQuery(("nine", "six"), slop=4, in_order=True)),
        ("near_unordered_nine_six",
         SpanNearQuery(("nine", "six"), slop=4, in_order=False)),
        ("near_or_six_seven",
         SpanNearQuery((("six", "seven"), ("seven", "six")), slop=10, in_order=True)),
        ("nested_three_hundred_thirty_three",
         SpanNearQuery(
             (SpanNearQuery(("three", "hundred"), slop=0, in_order=True),
              SpanNearQuery(("thirty", "three"), slop=0, in_order=True)),
             slop=0, in_order=True)),
        # the REAL SpanOrQuery over two SpanNears (round-4 composability
        # extension — testSpanOr's exact construction)
        ("or_thirtythree_fortyseven",
         SpanOrQuery((SpanNearQuery(("thirty", "three"), slop=0, in_order=True),
                      SpanNearQuery(("forty", "seven"), slop=0, in_order=True)))),
        # testSpanComplex1: ordered near(100) of or(near(six hundred),
        # near(seven hundred)) and or(seven, six)
        ("complex1_six_seven_hundred",
         SpanNearQuery(
             (SpanOrQuery((SpanNearQuery(("six", "hundred"), slop=0, in_order=True),
                           SpanNearQuery(("seven", "hundred"), slop=0, in_order=True))),
              ("seven", "six")),
             slop=100, in_order=True)),
    ])
    q["ft_golden_span_pos"] = _golden_cases([
        ("first_five_1", SpanFirstQuery("five", 1)),
        ("posrange_five_1_2", SpanPositionRangeQuery("five", 1, 2)),
        ("posrange_five_0_1", SpanPositionRangeQuery("five", 0, 1)),
    ])
    # the full TestBasics SpanNot family (TestBasics.java:189-333): span
    # includes/excludes, or-excludes, near excludes, nested SpanFirst
    # include AND exclude, positive/negative/huge pre-post windows
    _near_8_1 = SpanNearQuery(("eight", "one"), slop=4, in_order=True)
    _near_8_40 = SpanNearQuery(("eight", "forty"), slop=4, in_order=True)
    q["ft_golden_span_not"] = _golden_cases([
        ("not_eight_one_forty", SpanNotQuery(_near_8_1, "forty")),
        ("not_large_window",
         SpanNotQuery(_near_8_1, "forty", pre=2**31 - 1, post=2**31 - 1)),
        ("not_multiple_many",
         SpanNotQuery(_near_8_1, ("forty", "sixty", "eighty"))),
        ("not_near_exclude",
         SpanNotQuery(_near_8_1, SpanNearQuery(("hundred", "forty"), slop=1, in_order=True))),
        ("not_first_nested",
         SpanNotQuery(
             SpanFirstQuery("forty", 5),
             SpanFirstQuery(SpanNearQuery(("hundred", "forty"), slop=4, in_order=True), 4))),
        ("not_window_one", SpanNotQuery(_near_8_40, "one", pre=1, post=1)),
        ("not_window_two_before", SpanNotQuery(_near_8_40, "one", pre=2, post=0)),
        ("not_window_neg_post2", SpanNotQuery(_near_8_1, ("forty",), pre=0, post=-2)),
        ("not_window_neg_pre3", SpanNotQuery(_near_8_1, ("forty",), pre=-3, post=0)),
        ("not_double_excludes",
         SpanNotQuery(SpanNearQuery(("forty", "two"), slop=2, in_order=True),
                      "one", pre=4, post=1)),
    ])

    def ft_golden_fuzzy_suggest(spark, sf_dir):
        """Reference golden vectors for FuzzySuggester (``reference lucene/
        suggest/src/test/org/apache/lucene/search/suggest/analyzing/
        FuzzySuggesterTest.java:103-181`` testKeyword): build the test's own
        4-entry dictionary under KeywordAnalyzer and replay its 9 lookups
        through the engine's suggester.  Emitted rows are only the positions
        the reference test asserts (rank/surface/weight literals) plus each
        lookup's asserted result size (rank -1, '#size'); the oracle is a
        pure VALUES list of those assertions."""
        import pandas as pd

        from .operators.suggesters import FuzzySuggester, KeywordAnalyzer

        entries = spark.createDataFrame(
            pd.DataFrame(
                {"surface": ["foo", "bar", "barbar", "barbara"], "weight": [50, 10, 12, 6]}
            )
        )
        sugg = FuzzySuggester.build(entries, KeywordAnalyzer())
        cases = [  # (variant, typed input, n, how many rows the test asserts)
            ("fuzzy_bariar", "bariar", 2, 1),
            ("fuzzy_barbr", "barbr", 2, 1),
            ("exact_barbara", "barbara", 2, 1),
            ("exact_barbar", "barbar", 2, 2),
            ("fuzzy_barbaa", "barbaa", 2, 2),
            ("prefix_f", "f", 2, 1),
            ("exactfirst_bar_n1", "bar", 1, 1),
            ("prefix_b", "b", 2, 2),
            ("prefix_ba", "ba", 3, 3),
        ]
        rows = []
        for vname, qstr, n, n_assert in cases:
            got = sugg.lookup(qstr, n).toPandas()
            rows.append((vname, -1, "#size", len(got)))
            for r in range(min(n_assert, len(got))):
                rows.append((vname, r + 1, str(got.iloc[r]["surface"]), int(got.iloc[r]["weight"])))
        return (
            spark.createDataFrame(
                pd.DataFrame(rows, columns=["variant", "rank", "surface", "weight"])
            )
            .select(
                "variant",
                F.col("rank").cast("int").alias("rank"),
                "surface",
                F.col("weight").cast("long").alias("weight"),
            )
            .orderBy("variant", "rank")
        )

    q["ft_golden_fuzzy_suggest"] = ft_golden_fuzzy_suggest

    def ft_golden_intervals(spark, sf_dir):
        """Reference golden vectors for the minimal-interval algebra
        (``reference lucene/sandbox/src/test/org/apache/lucene/search/
        intervals/TestIntervals.java:176-330``): rebuild the test's own
        6-doc pease-porridge corpus, run the engine's interval sources
        (term / ordered / phrase / unordered / or / nested combinations)
        with ``output='intervals'`` (the MatchesIterator surface), and
        emit every minimal interval as (variant, doc_id, start, end).  The
        oracle is a pure VALUES list of the reference's checkIntervals
        arrays."""
        from .functions.interval_sources import IOr, IOrdered, IPhrase, ITerm, IUnordered
        from .functions.span_golden_data import INTERVALS_FIELD1, INTERVALS_FIELD2

        def _searcher(tag, texts):
            key = ("golden_intervals", tag)
            if key not in _INDEX_CACHE:
                import pandas as pd

                pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
                corpus = (
                    spark.createDataFrame(pdf)
                    .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
                    .repartition(2)
                    .persist()
                )
                idx = build_index(
                    corpus,
                    IndexConfig(
                        analyzer=simple_analyzer(), n_partitions=2, index_positions=True
                    ),
                ).persist()
                _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
            return _INDEX_CACHE[key]

        s1 = _searcher("f1", INTERVALS_FIELD1)
        s2 = _searcher("f2", INTERVALS_FIELD2)
        cases = [
            ("term_porridge", s1, ITerm("porridge")),
            ("ordered_pease_hot", s1, IOrdered((ITerm("pease"), ITerm("hot")))),
            ("phrase_pease_porridge", s1, IPhrase((ITerm("pease"), ITerm("porridge")))),
            ("unordered_pease_hot", s1, IUnordered((ITerm("pease"), ITerm("hot")))),
            ("or_pease_hot_notmatching", s1,
             IOr((ITerm("pease"), ITerm("hot"), ITerm("notmatching")))),
            ("nested_unordered_or", s1,
             IUnordered((ITerm("pease"), ITerm("porridge"),
                         IOr((ITerm("hot"), ITerm("cold")))))),
            ("combo_disjunction_f2", s2,
             IOrdered((IOr((ITerm("alph"), ITerm("sacred"))), ITerm("measureless")))),
        ]
        out = None
        for vname, s, src in cases:
            rows = s.interval_source_query(src, output="intervals").select(
                F.lit(vname).alias("variant"),
                F.col("doc_id").cast("long"),
                F.col("start").cast("int"),
                F.col("end").cast("int"),
            )
            out = rows if out is None else out.unionByName(rows)
        return out.orderBy("variant", "doc_id", "start", "end")

    q["ft_golden_intervals"] = ft_golden_intervals

    def ft_golden_sloppy_phrase(spark, sf_dir):
        """Reference golden vectors for sloppy-phrase matching (``reference
        lucene/core/src/test/org/apache/lucene/search/TestSloppyPhraseQuery.
        java:39-135``): rebuild the test's own fixed documents under its
        whitespace/no-lowercase analysis (MockTokenizer.WHITESPACE, false),
        run the engine's PhraseQuery at every slop boundary the reference's
        expectedNumResults formulas switch on, and emit (variant, slop,
        matched).  The oracle is a pure VALUES list of the reference's own
        "Wrong number of hits" literals — incl. the LUCENE-1310 slop-6
        threshold and the LUCENE-3412 repeat family."""
        import pandas as pd

        from .functions.analysis import Analyzer
        from .functions.phrase_golden_data import (
            SLOPPY_CASES,
            SLOPPY_CONTRACT_SLOPS,
            SLOPPY_DOC_IDS,
            SLOPPY_DOCS,
            SLOPPY_QUERIES,
        )

        ws = Analyzer(pattern=r"\S+", lowercase=False)
        s = tiny_searcher(spark, "sloppy_phrase", list(SLOPPY_DOCS.values()), ws)
        needed = sorted(
            {
                (qname, slop)
                for _v, qname, _d, _e, slops in SLOPPY_CASES
                for slop in slops
                if slop in SLOPPY_CONTRACT_SLOPS
            }
        )
        hits = None
        for qname, slop in needed:
            pq = PhraseQuery(tuple(SLOPPY_QUERIES[qname]), slop=slop)
            h = s.search(ConstantScoreQuery(pq), 20).df.select(
                F.lit(qname).alias("qname"),
                F.lit(slop).alias("slop"),
                F.col("doc_id").alias("target"),
            )
            hits = h if hits is None else hits.unionByName(h)
        pairs = [
            (variant, qname, slop, SLOPPY_DOC_IDS[dname])
            for variant, qname, dname, _e, slops in SLOPPY_CASES
            for slop in slops
            if slop in SLOPPY_CONTRACT_SLOPS
        ]
        exp = spark.createDataFrame(
            pd.DataFrame(pairs, columns=["variant", "qname", "slop", "target"])
        )
        out = exp.join(hits.withColumn("hit", F.lit(1)), ["qname", "slop", "target"], "left")
        return out.select(
            "variant",
            F.col("slop").cast("int").alias("slop"),
            F.coalesce(F.col("hit"), F.lit(0)).cast("int").alias("matched"),
        ).orderBy("variant", "slop")

    q["ft_golden_sloppy_phrase"] = ft_golden_sloppy_phrase

    def ft_golden_multiphrase(spark, sf_dir):
        """Reference golden vectors for MultiPhraseQuery (``reference lucene/
        core/src/test/org/apache/lucene/search/TestMultiPhraseQuery.java:
        49-290``): rebuild each test's corpus, expand prefix slots against
        the engine's own term dictionary (the test's TermsEnum.seekCeil
        loop), and emit each variant's hit count.  Covers union slots,
        setSlop(1) over a union slot, explicit slot positions with a gap
        (testMultiExactWithRepeats), a single-slot MPQ under a MUST boolean
        (bug 33161), and an unindexed slot (testNoDocs).  The oracle is a
        pure VALUES list of the reference's assertEquals hit-count
        literals."""
        import pandas as pd

        from .functions.phrase_golden_data import MULTIPHRASE_CORPORA, MULTIPHRASE_COUNTS

        searchers = {
            tag: tiny_searcher(spark, f"mpq_{tag}", texts)
            for tag, texts in MULTIPHRASE_CORPORA.items()
        }

        def expand(s, prefix):
            return tuple(
                sorted(
                    r["term"]
                    for r in s.index.terms.filter(F.col("term").startswith(prefix))
                    .select("term")
                    .distinct()
                    .collect()
                )
            )

        pp = searchers["pp"]
        pi, blue = expand(pp, "pi"), expand(pp, "blue")
        queries = {
            "pp_blueberry_pistar": ("pp", MultiPhraseQuery((("blueberry",), pi))),
            "pp_strawberry_pistar": ("pp", MultiPhraseQuery((("strawberry",), pi))),
            "pp_bluestar_pizza": ("pp", MultiPhraseQuery((blue, ("pizza",)))),
            "pp_bluestar_pizza_slop1": ("pp", MultiPhraseQuery((blue, ("pizza",)), slop=1)),
            "tall_union_last_slot": (
                "tall",
                MultiPhraseQuery((("blueberry",), ("chocolate",), ("pie", "tart"))),
            ),
            "exact_repeats_gap": (
                "abc",
                MultiPhraseQuery((("a", "d"), ("a", "f")), positions=(0, 2)),
            ),
            "bool_single_slot_prefix": (
                "bool",
                BooleanQuery.build(
                    must=[TermQuery("pie"), MultiPhraseQuery((("blueberry", "blue"),))]
                ),
            ),
            "nodocs_unindexed_slot": ("nodocs", MultiPhraseQuery((("a",), ("nope", "nope")))),
        }
        counted = None
        for vname, (tag, query) in queries.items():
            c = (
                searchers[tag]
                .search(ConstantScoreQuery(query), 100)
                .df.select(F.lit(vname).alias("variant"))
                .groupBy("variant")
                .agg(F.count("*").cast("bigint").alias("n_hits"))
            )
            counted = c if counted is None else counted.unionByName(c)
        exp = spark.createDataFrame(
            pd.DataFrame({"variant": sorted(MULTIPHRASE_COUNTS)})
        )
        return (
            exp.join(counted, "variant", "left")
            .select(
                "variant",
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            )
            .orderBy("variant")
        )

    q["ft_golden_multiphrase"] = ft_golden_multiphrase

    def ft_golden_json_facets(spark, sf_dir):
        """Reference golden vectors for the JSON Facet API (``reference solr/
        core/src/test/org/apache/solr/search/facet/TestJsonFacets.java:
        233-245 indexSimple, :888-965 testMethodStream, :246-318
        testBehaviorEquivilenceOfUninvertibleFalse``): rebuild the 6-doc
        corpus and replay the asserted facet requests through the engine's
        json_facet operator — root stats, count/index sorts, mincount,
        prefix, offset, nested cat→where buckets with min/max stats, and a
        range-filtered domain.  Emitted rows flatten the asserted bucket
        trees to (variant, parent, val, count, stat); the oracle is a pure
        VALUES list of the assertJQ literals."""
        from .functions.phrase_golden_data import JSON_FACET_DOCS
        from .operators.jsonfacet import json_facet

        key = ("golden_json_facets",)
        if key not in _INDEX_CACHE:
            _INDEX_CACHE[key] = spark.createDataFrame(
                JSON_FACET_DOCS,
                schema=(
                    "id int, cat_s string, where_s string, num_d double, "
                    "num_i int, val_b boolean, sparse_s string"
                ),
            ).persist()
        df = _INDEX_CACHE[key]

        def flat(vname, spec, domain=df):
            rows = json_facet(domain, spec)
            field = spec["field"]
            statname = next(iter(spec.get("stats") or {}), None)
            stat = (
                F.col(f"{field}_{statname}").cast("double")
                if statname
                else F.lit(None).cast("double")
            )
            return rows.select(
                F.lit(vname).alias("variant"),
                F.lit("").alias("parent"),
                F.col(field).cast("string").alias("val"),
                F.col(f"{field}_count").cast("bigint").alias("count"),
                stat.alias("stat"),
            )

        root = json_facet(df, {"field": None, "stats": {"x": "sum(num_d)", "y": "min(num_d)"}})
        out = root.select(
            F.lit("root_sum").alias("variant"), F.lit("").alias("parent"),
            F.lit("#root").alias("val"), F.col("count"),
            F.col("x").cast("double").alias("stat"),
        ).unionByName(
            root.select(
                F.lit("root_min").alias("variant"), F.lit("").alias("parent"),
                F.lit("#root").alias("val"), F.col("count"),
                F.col("y").cast("double").alias("stat"),
            )
        )
        out = out.unionByName(flat("cat", {"field": "cat_s"}))
        out = out.unionByName(flat("cat2", {"field": "cat_s", "sort": "index asc"}))
        out = out.unionByName(
            flat("cat3", {"field": "cat_s", "sort": "index asc", "mincount": 3})
        )
        out = out.unionByName(
            flat("cat4", {"field": "cat_s", "sort": "index asc", "prefix": "B"})
        )
        out = out.unionByName(
            flat("cat5", {"field": "cat_s", "sort": "index asc", "offset": 1})
        )

        def nested(vname, parent_stats, child_stats):
            spec = {
                "field": "cat_s",
                "sort": "index asc",
                "stats": parent_stats,
                "facet": {"field": "where_s", "sort": "index asc", "stats": child_stats},
            }
            rows = json_facet(df, spec).persist()
            pstat = next(iter(parent_stats), None)
            cstat = next(iter(child_stats), None)
            parents = rows.select(
                F.lit(vname).alias("variant"),
                F.lit("").alias("parent"),
                F.col("cat_s").cast("string").alias("val"),
                F.col("cat_s_count").cast("bigint").alias("count"),
                (
                    F.col(f"cat_s_{pstat}").cast("double")
                    if pstat
                    else F.lit(None).cast("double")
                ).alias("stat"),
            ).distinct()
            children = rows.select(
                F.lit(vname).alias("variant"),
                F.col("cat_s").cast("string").alias("parent"),
                F.col("where_s").cast("string").alias("val"),
                F.col("where_s_count").cast("bigint").alias("count"),
                (
                    F.col(f"where_s_{cstat}").cast("double")
                    if cstat
                    else F.lit(None).cast("double")
                ).alias("stat"),
            )
            return parents.unionByName(children)

        out = out.unionByName(nested("nested", {}, {}))
        out = out.unionByName(
            nested("nested_stats", {"y": "min(num_d)"}, {"x": "max(num_d)"})
        )

        # testBehaviorEquivilenceOfUninvertibleFalse: q=num_i:[* TO 2]
        dom = df.filter(F.col("num_i") <= 2)
        nf = dom.agg(F.count("*").cast("bigint").alias("count")).select(
            F.lit("uninvert_where").alias("variant"), F.lit("").alias("parent"),
            F.lit("#numFound").alias("val"), F.col("count"),
            F.lit(None).cast("double").alias("stat"),
        )
        out = out.unionByName(nf).unionByName(
            flat("uninvert_where", {"field": "where_s"}, domain=dom)
        )
        return out.orderBy("variant", "parent", "val")

    q["ft_golden_json_facets"] = ft_golden_json_facets

    def ft_golden_fuzzy_query(spark, sf_dir):
        """Reference golden vectors for FuzzyQuery (``reference lucene/core/
        src/test/org/apache/lucene/search/TestFuzzyQuery.java:56-183``
        testFuzziness): rebuild the 7-word corpus and replay every asserted
        construction — maxEdits=2 across prefix lengths 0..6 (incl. the
        prefix>len clamp), maxExpansions=2 (the pq-size cut), transpositions
        on/off, and the not-similar-enough cases — emitting each query's
        asserted hit count and, where the reference asserts them, the hit
        SURFACES in score order (the TopTermsBlendedFreqScoringRewrite
        ordering).  Oracle = pure VALUES of those assertEquals literals."""
        import pandas as pd

        from .functions.phrase_golden_data import FUZZY_CASES, FUZZY_WORDS

        s = tiny_searcher(spark, "fuzzy_golden", FUZZY_WORDS)
        surfaces = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(FUZZY_WORDS)), "surface": FUZZY_WORDS})
        ).select(F.col("doc_id").cast("long"), "surface")
        out = None
        for variant, term, p, m, tr, _size, order in FUZZY_CASES:
            fq = FuzzyQuery(
                term, max_edits=2, prefix_length=p, max_expansions=m, transpositions=tr
            )
            top = s.search(fq, 100).df
            size_row = top.agg(F.count("*").cast("int").alias("n")).select(
                F.lit(variant).alias("variant"),
                F.lit(-1).alias("rank"),
                F.lit("#size").alias("surface"),
                F.col("n"),
            )
            out = size_row if out is None else out.unionByName(size_row)
            if order:
                w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
                ranked = (
                    top.withColumn("rank", F.row_number().over(w).cast("int"))
                    .join(F.broadcast(surfaces), "doc_id")
                    .select(
                        F.lit(variant).alias("variant"), "rank", "surface",
                        F.lit(-1).alias("n"),
                    )
                )
                out = out.unionByName(ranked)
        return out.orderBy("variant", "rank")

    q["ft_golden_fuzzy_query"] = ft_golden_fuzzy_query

    def ft_golden_unified_highlight(spark, sf_dir):
        """Reference golden vectors for the UnifiedHighlighter (``reference
        lucene/highlighter/src/test/org/apache/lucene/search/uhighlight/
        TestUnifiedHighlighter.java:128-290``): rebuild each test corpus,
        search the asserted term, highlight through the engine's
        sentence-passage highlighter, and emit the snippet STRINGS — the
        sentence-BreakIterator spans (trailing whitespace included), the
        <b></b> formatter, passage selection, and setMaxLength(17)
        truncation incl. the LUCENE-5166 match-crossing-the-cut drop.  The
        oracle is a pure VALUES list of the reference's assertEquals
        snippet literals."""
        from .functions.phrase_golden_data import HIGHLIGHT_CASES

        out = None
        for variant, texts, term, max_length, expected in HIGHLIGHT_CASES:
            s = tiny_searcher(spark, f"uh_{variant}", texts)
            top = s.search(TermQuery(term), 10)
            hl = s.highlight_unified(top, [term], max_passages=1, max_length=max_length)
            rows = hl.select(
                F.concat(F.lit(f"{variant}_"), F.col("doc_id").cast("string")).alias(
                    "variant"
                ),
                "snippet",
            )
            out = rows if out is None else out.unionByName(rows)
        return out.orderBy("variant")

    q["ft_golden_unified_highlight"] = ft_golden_unified_highlight

    def ft_golden_grouping(spark, sf_dir):
        """Reference golden vectors for grouping (``reference solr/core/src/
        test/org/apache/solr/TestGroupingSearch.java:85-126``
        testGroupingGroupSortingScore_basic): rebuild the 5-doc corpus (title
        indexed as the text field; name/group_i/id_i stored columns) and
        replay both asserted requests through the engine — q={!func}id_i
        grouped by name (a MatchAll base with score_expr='id_i', the
        predictable-score construction the test uses) and q=title:title
        (BM25) grouped by group_i.  Emits each group's rank, groupValue,
        numFound, and top doc id; the oracle is a pure VALUES list of the
        assertQ XPath literals."""
        import pandas as pd

        from .functions.phrase_golden_data import GROUPING_DOCS
        from .plans.query import MatchAllQuery

        key = ("golden_grouping",)
        if key not in _INDEX_CACHE:
            pdf = pd.DataFrame(
                GROUPING_DOCS, columns=["id", "id_i", "name", "text", "group_i"]
            )
            pdf["doc_id"] = range(len(pdf))
            corpus = (
                spark.createDataFrame(pdf)
                .select(
                    F.col("doc_id").cast("long"), "text", "id", "id_i", "name", "group_i"
                )
                .repartition(2)
                .persist()
            )
            idx = build_index(
                corpus,
                IndexConfig(analyzer=simple_analyzer(), n_partitions=2, index_positions=True),
            ).persist()
            _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
        s = _INDEX_CACHE[key]

        def grouped(vname, query, group_col, score_expr=None):
            top1 = s.group_topk(query, group_col, 1, score_expr=score_expr).filter(
                F.col("rank") == 1
            )
            counts = s.facet(query, group_col)
            w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
            return (
                top1.join(counts, group_col)
                .withColumn("grank", F.row_number().over(w).cast("int"))
                .select(
                    F.lit(vname).alias("variant"),
                    "grank",
                    F.col(group_col).cast("string").alias("group_value"),
                    F.col("cnt").cast("bigint").alias("n_found"),
                    (F.col("doc_id") + 1).cast("bigint").alias("top_id"),
                )
            )

        out = grouped("func_by_name", MatchAllQuery(), "name", score_expr="id_i")
        out = out.unionByName(grouped("title_by_groupi", TermQuery("title"), "group_i"))
        return out.orderBy("variant", "grank")

    q["ft_golden_grouping"] = ft_golden_grouping

    def agg_relatedness(spark, sf_dir):
        """JSON facet relatedness() — Semantic Knowledge Graph bucket scores
        (solr/.../facet/RelatednessAgg.java), quantized to 1e-5 fixed point
        (the reference itself rounds to 5 digits)."""
        s = doc_searcher(spark, sf_dir)
        rel = s.relatedness(TermQuery(HOT), "lang")
        return rel.select(
            "lang",
            F.col("fg_count").cast("bigint").alias("fg_count"),
            F.col("bg_count").cast("bigint").alias("bg_count"),
            F.floor(F.col("fg_pop") * 1e5 + F.lit(0.5)).cast("bigint").alias("fg_pop_q"),
            F.floor(F.col("bg_pop") * 1e5 + F.lit(0.5)).cast("bigint").alias("bg_pop_q"),
            F.floor(F.col("relatedness") * 1e5 + F.lit(0.5)).cast("bigint").alias("rel_q"),
        ).orderBy("lang")

    q["agg_relatedness"] = agg_relatedness

    def agg_facet_sampled(spark, sf_dir):
        """RandomSamplingFacetsCollector analog: facet counts on a
        deterministic 1-in-4 hash subsample of the match set + 4x scale-back
        estimates (pure-integer hash so the oracle replays it exactly)."""
        s = doc_searcher(spark, sf_dir)
        return s.sampled_facet(TermQuery(HOT), "lang", rate=4).orderBy("lang")

    q["agg_facet_sampled"] = agg_facet_sampled

    def agg_taxonomy_rollup(spark, sf_dir):
        """Taxonomy facet counting (lucene/facet taxonomy/): hierarchical
        dim lang -> source counted at every tree level via ROLLUP."""
        docs = _load(spark, sf_dir, "documents")
        return (
            docs.rollup("lang", "source")
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .select(
                F.coalesce(F.col("lang"), F.lit("<ALL>")).alias("lang"),
                F.coalesce(F.col("source"), F.lit("<ALL>")).alias("source"),
                "cnt",
            )
            .orderBy("lang", "source")
        )

    q["agg_taxonomy_rollup"] = agg_taxonomy_rollup

    def agg_json_facet(spark, sf_dir):
        """JSON Facet API nested terms facets (``solr/core/.../search/facet/
        FacetField*``): lang buckets sorted by sum(n_chars) desc limit 3,
        nested source sub-buckets sorted by count desc limit 2, avg stat."""
        from .operators.jsonfacet import json_facet

        docs = _load(spark, sf_dir, "documents")
        spec = {
            "name": "lang",
            "field": "lang",
            "limit": 3,
            "sort": "chars_sum desc",
            "stats": {"chars_sum": "sum(n_chars)"},
            "facet": {
                "name": "src",
                "field": "source",
                "limit": 2,
                "sort": "count desc",
                "stats": {"chars_avg": "avg(n_chars)"},
            },
        }
        out = json_facet(docs, spec)
        return out.select(
            "lang",
            "source",
            F.col("lang_count").cast("bigint").alias("lang_count"),
            F.col("lang_chars_sum").cast("bigint").alias("lang_chars_sum"),
            F.col("src_count").cast("bigint").alias("src_count"),
            F.col("src_chars_avg").cast("double").alias("src_chars_avg"),
        ).orderBy("lang", "source")

    q["agg_json_facet"] = agg_json_facet

    # ---- FILTER occur (non-scoring clause) + boosted SHOULD clause
    q["ft_filter_clause"] = _search_q(
        BooleanQuery.build(must=[TermQuery(MID)], filter=[TermQuery(HOT)])
    )
    q["ft_boost"] = _search_q(
        BooleanQuery.build(should=[BoostQuery(TermQuery(MID), 2.0), TermQuery(RARE)])
    )

    def ft_spellcheck(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.spellcheck("scann", max_edits=2, n=5)

    q["ft_spellcheck"] = ft_spellcheck

    def agg_drill_sideways(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.drill_sideways(TermQuery(HOT), {"lang": "en", "source": "src3"}).orderBy("dim", "value")

    q["agg_drill_sideways"] = agg_drill_sideways

    def agg_collapse_expand(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.expand(TermQuery(HOT), "source", n_expand=2)

    q["agg_collapse_expand"] = agg_collapse_expand

    # ---- keyword / point fields (StringField + PointRangeQuery analogs:
    # Catalyst column predicates pushed to the corpus scan) + parsed queries
    q["ft_field_filter"] = _search_q(
        BooleanQuery.build(must=[TermQuery(HOT)], filter=[FieldTermQuery("lang", "en")])
    )
    q["ft_point_range"] = _search_q(
        BooleanQuery.build(must=[TermQuery(MID)], filter=[FieldRangeQuery("n_chars", 120, 300)])
    )

    def ft_flexible_parse(spark, sf_dir):
        """Flexible (StandardQueryParser) grammar end-to-end: AND default
        operator plus the whitespace-bound ``!`` NOT modifier
        (TestStandardQP.testOperatorVsWhitespace) — ``scan sort ! dup``
        parses to +scan +sort -dup and evaluates on the classic engine."""
        from .plans.flexible_parser import parse_flexible_query

        s = doc_searcher(spark, sf_dir)
        query = parse_flexible_query(
            f"{HOT} {MID2} ! {RARE}", simple_analyzer(), default_operator="AND"
        )
        return _ranked(s.search(query, 10).df)

    q["ft_flexible_parse"] = ft_flexible_parse

    def ft_parsed_field(spark, sf_dir):
        """End-to-end classic syntax with a field clause: parser → AST →
        boolean evaluation (the Solr example shape ``role:assistant +tool:
        bash error`` over our documents columns)."""
        s = doc_searcher(spark, sf_dir)
        query = parse_query(f"lang:en AND {HOT}", simple_analyzer())
        return _ranked(s.search(query, 10).df)

    q["ft_parsed_field"] = ft_parsed_field

    def ft_xml_parse(spark, sf_dir):
        """CoreParser XML surface end-to-end (``queryparser/xml/CoreParser.
        java:41``): BooleanQuery element with must/mustNot/filter Clause
        children, fieldName inheritance from the root, a typed
        PointRangeQuery filter, evaluated on the classic engine."""
        from .plans.xml_parser import parse_xml_query

        s = doc_searcher(spark, sf_dir)
        query = parse_xml_query(
            f"""
            <BooleanQuery fieldName="text">
              <Clause occurs="must"><TermQuery>{HOT2}</TermQuery></Clause>
              <Clause occurs="mustNot"><TermQuery>{RARE}</TermQuery></Clause>
              <Clause occurs="filter">
                <PointRangeQuery fieldName="n_chars" type="int"
                                 lowerTerm="120" upperTerm="300"/>
              </Clause>
            </BooleanQuery>""",
            simple_analyzer(),
        )
        return _ranked(s.search(query, 10).df)

    q["ft_xml_parse"] = ft_xml_parse

    q["ft_xml_span"] = _const_ids_xml(
        f"""
        <SpanNear slop="2" inOrder="true" fieldName="text">
          <SpanTerm>{HOT}</SpanTerm>
          <SpanOrTerms>{HOT2} {MID}</SpanOrTerms>
        </SpanNear>"""
    )

    def ft_funcq(spark, sf_dir):
        """Named function-query registry (ValueSourceParser surface): boost
        BM25 by recip of document length and termfreq of another term."""
        s = doc_searcher(spark, sf_dir)
        return _ranked(
            s.function_query_score(
                TermQuery(HOT),
                f"product(recip(n_chars,1,1000,1000), sum(termfreq(text,'{HOT2}'), 1))",
                10,
            ).df
        )

    q["ft_funcq"] = ft_funcq

    def ft_search_after(spark, sf_dir):
        """searchAfter / cursorMark deep paging: page 2 via the (score,
        doc_id) cursor of page 1's last hit."""
        s = doc_searcher(spark, sf_dir)
        last_doc, last_score = s.search(TermQuery(HOT), 10).collect()[-1]
        top2 = s.search_after(TermQuery(HOT), 10, after=(last_score, last_doc))
        return _ranked(top2.df)

    q["ft_search_after"] = ft_search_after

    def ft_explain(spark, sf_dir):
        """IndexSearcher.explain flattened over a whole top-10 page (the
        Solr debug=results shape): per-clause BM25 leaves (tf, df, quantized
        weight and score) for every hit of the flagship boolean query — one
        scored-postings pass for all ten docs, not ten driver round-trips."""
        s = doc_searcher(spark, sf_dir)
        bq = BooleanQuery.build(should=[TermQuery(HOT), TermQuery(MID)])
        ids = [r["doc_id"] for r in s.search(bq, 10).df.select("doc_id").collect()]
        return s.explain_rows(bq, ids).orderBy("doc_id", "term")

    q["ft_explain"] = ft_explain

    def ft_cluster_topk(spark, sf_dir):
        """Search-result clustering (Solr ClusteringComponent role): cluster
        the HOT query's top-60 page into 4 groups by hashed-token vectors +
        the engine's deterministic integer k-means. K-row post-search work,
        like the reference component."""
        from .operators.clustering import cluster_results

        s = doc_searcher(spark, sf_dir)
        return cluster_results(s, TermQuery(HOT), n=60, k=4, n_buckets=32).orderBy("doc_id")

    q["ft_cluster_topk"] = ft_cluster_topk

    # ---- pluggable similarities (search/similarities/: ClassicSimilarity,
    # BooleanSimilarity, LMDirichletSimilarity) over the same index
    def _sim_search_q(query, sim_factory, k=10):
        def fn(spark, sf_dir):
            base = doc_searcher(spark, sf_dir)
            s = IndexSearcher(base.index, base.corpus, similarity=sim_factory())
            return _ranked(s.search(query, k).df)

        return fn

    def ft_joinutil(spark, sf_dir):
        """Query-time join (JoinUtil / GlobalOrdinalsWithScoreQuery,
        ScoreMode.Max): docs sharing a `source` with any RARE-matching doc,
        scored by the max from-side BM25 score of that source."""
        s = doc_searcher(spark, sf_dir)
        return _ranked(s.join_query(TermQuery(RARE), "source", "source", "max", 10).df)

    q["ft_joinutil"] = ft_joinutil

    def cls_naive_bayes(spark, sf_dir):
        """lucene/classification SimpleNaiveBayesClassifier over the index:
        assign each document its argmax `lang` class.  Scores are the
        order-free 2^-20 fixed-point contract path (classify.py docstring)."""
        from lucene_solr_spark.operators.classify import SimpleNaiveBayesClassifier

        s = doc_searcher(spark, sf_dir)
        nb = SimpleNaiveBayesClassifier(s.index, s.corpus, "lang")
        return (
            nb.classify()
            .select(F.col("doc_id").cast("long"), "cls", F.col("score").cast("long"))
            .orderBy("doc_id")
        )

    q["cls_naive_bayes"] = cls_naive_bayes

    def cls_confusion(spark, sf_dir):
        """ConfusionMatrixGenerator analog (``reference lucene/classification/
        src/java/org/apache/lucene/classification/utils/
        ConfusionMatrixGenerator.java:63-121``): run the NB classifier over
        every document and cross-tabulate actual `lang` vs assigned class."""
        from lucene_solr_spark.operators.classify import (
            SimpleNaiveBayesClassifier,
            confusion_matrix,
        )

        s = doc_searcher(spark, sf_dir)
        nb = SimpleNaiveBayesClassifier(s.index, s.corpus, "lang")
        return confusion_matrix(nb.classify(), s.corpus, "lang").orderBy("actual", "assigned")

    q["cls_confusion"] = cls_confusion

    def cls_split(spark, sf_dir):
        """DatasetSplitter analog (``reference .../classification/utils/
        DatasetSplitter.java:40-102``): deterministic 70/20/10
        train/test/cross-validation split; per-(split, lang) counts."""
        from lucene_solr_spark.operators.classify import split_dataset

        s = doc_searcher(spark, sf_dir)
        return (
            split_dataset(s.corpus, test_ppm=200_000, cv_ppm=100_000)
            .groupBy("split", "lang")
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy("split", "lang")
        )

    q["cls_split"] = cls_split

    def cls_knn(spark, sf_dir):
        """KNearestNeighborClassifier (``reference
        KNearestNeighborClassifier.java:130-236``) for four fixed docs: MLT
        top-10 neighbour vote in the 2^-20 fixed-point contract path."""
        from lucene_solr_spark.operators.classify import KNearestNeighborClassifier

        s = doc_searcher(spark, sf_dir)
        knn = KNearestNeighborClassifier(s, "lang")
        # batched path: all four MLT queries share ONE postings scan
        # (bit-identical to per-target classify_doc_quantized — tested)
        res = knn.classify_docs_quantized(KNN_TARGETS)
        rows = [
            (t, res[t][0], int(res[t][1])) for t in KNN_TARGETS if res.get(t) is not None
        ]
        return spark.createDataFrame(rows, "target_id long, cls string, vote long")

    q["cls_knn"] = cls_knn

    def cls_perceptron(spark, sf_dir):
        """BooleanPerceptronClassifier (``reference
        BooleanPerceptronClassifier.java``): all-integer perceptron, label =
        (lang == 'en'), single-shard reference-exact training.  FULL oracle:
        at batch_size=1 the FST snapshot refreshes after every misclassified
        doc, so the sequential loop is a pure state machine over the fixed
        corpus vocabulary — the oracle replays it doc-by-doc as a recursive
        CTE on the integer weight list.  The training loop is additionally
        pinned bit-exactly by
        ``test_classify_utils.py::test_perceptron_reference_parity``."""
        from lucene_solr_spark.operators.classify import BooleanPerceptronClassifier

        s = doc_searcher(spark, sf_dir)
        labeled = s.corpus.withColumn("is_en", F.col("lang") == "en")
        p = BooleanPerceptronClassifier(s.index, labeled, "is_en")
        p.train(n_partitions=1)
        return (
            p.classify()
            .select(F.col("doc_id").cast("long"), "output", "assigned")
            .orderBy("doc_id")
        )

    q["cls_perceptron"] = cls_perceptron

    def cls_knn_fuzzy(spark, sf_dir):
        """KNearestFuzzyClassifier (``reference KNearestFuzzyClassifier.java``
        + ``utils/NearestFuzzyQuery.java``): classify three unseen (and
        misspelled) strings by the fuzzy-expanded top-10 neighbour vote in
        the 2^-20 fixed-point contract path."""
        from lucene_solr_spark.operators.classify import KNearestFuzzyClassifier

        s = doc_searcher(spark, sf_dir)
        knn = KNearestFuzzyClassifier(s, "lang")
        rows = []
        for i, text in enumerate(KNN_FUZZY_TEXTS):
            res = knn.classify_text_quantized(text)
            if res is not None:
                rows.append((i, res[0], int(res[1])))
        return spark.createDataFrame(rows, "query_id long, cls string, vote long")

    q["cls_knn_fuzzy"] = cls_knn_fuzzy

    def cls_bm25nb(spark, sf_dir):
        """BM25NBClassifier (``reference BM25NBClassifier.java``): NB over
        BM25 top-1 search scores, class field as a 1-token BM25 field;
        2^-20 fixed-point posterior (quantize-before-sum contract path)."""
        from lucene_solr_spark.operators.classify import BM25NBClassifier

        s = doc_searcher(spark, sf_dir)
        nb = BM25NBClassifier(s, "lang")
        rows = nb.classify(KNN_TARGETS[:3])
        return spark.createDataFrame(rows, "doc_id long, cls string, score_q long")

    q["cls_bm25nb"] = cls_bm25nb

    def ft_flt(spark, sf_dir):
        """FuzzyLikeThisQuery (``reference lucene/sandbox/.../queries/
        FuzzyLikeThisQuery.java``) with ignoreTF: variants of two misspelled
        terms at maxEdits=2/prefix=2, each clause a constant-score TermQuery
        boosted by f32(boost² · classic_idf) — top-10."""
        from lucene_solr_spark.operators.classify import fuzzy_like_this_search

        s = doc_searcher(spark, sf_dir)
        top = fuzzy_like_this_search(
            s, FLT_TEXT, 10, max_edits=2, prefix_length=2, ignore_tf=True
        )
        return _ranked(top)

    q["ft_flt"] = ft_flt

    def _itv(terms, ordered, max_gaps):
        def fn(spark, sf_dir):
            """IntervalQuery (Intervals.ordered/unordered + maxgaps): rank by
            the quantized minimal-interval frequency (saturation scoring is
            strictly monotone in freq, so ranks match the reference's)."""
            s = doc_searcher(spark, sf_dir)
            out = s.interval_query(terms, ordered=ordered, max_gaps=max_gaps, k=20, output="freq_q")
            w = Window.orderBy(F.desc("freq_q"), F.asc("doc_id"))
            return out.select(
                F.row_number().over(w).cast("int").alias("rank"),
                F.col("doc_id").cast("long"),
                F.col("freq_q").cast("long"),
            )

        return fn

    q["itv_ordered"] = _itv([HOT, HOT2], True, 3)

    def itv_nested_or(spark, sf_dir):
        """Nested interval source (Intervals.ordered(Intervals.or(t1, t2),
        t3) with maxgaps): quantized minimal-interval frequency rank."""
        from .functions.interval_sources import IOr, IOrdered, ITerm

        s = doc_searcher(spark, sf_dir)
        src = IOrdered((IOr((ITerm(HOT2), ITerm(MID))), ITerm(HOT)), max_gaps=3)
        out = s.interval_source_query(src, k=20, output="freq_q")
        w = Window.orderBy(F.desc("freq_q"), F.asc("doc_id"))
        return out.select(
            F.row_number().over(w).cast("int").alias("rank"),
            F.col("doc_id").cast("long"),
            F.col("freq_q").cast("long"),
        )

    q["itv_nested_or"] = itv_nested_or
    q["itv_unordered"] = _itv([MID, HOT], False, 2)

    # deterministic synthetic coordinates for the spatial queries: integer
    # arithmetic on c_custkey (exact in both engines)
    def _cust_points(spark, sf_dir):
        cust = _load(spark, sf_dir, "customer")
        lat = (F.col("c_custkey") * 7919 % 18000) / F.lit(100.0) - F.lit(90.0)
        lon = (F.col("c_custkey") * 104729 % 36000) / F.lit(100.0) - F.lit(180.0)
        return cust.select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            lat.alias("lat"),
            lon.alias("lon"),
        )

    def geo_distance(spark, sf_dir):
        """LatLonPoint.newDistanceQuery + distance sort key: customers whose
        synthetic point lies within 3000 km of (37.77, -122.42)."""
        from lucene_solr_spark.functions.geo import geo_distance_meters, geo_distance_predicate

        pts = _cust_points(spark, sf_dir)
        out = pts.filter(geo_distance_predicate(F.col("lat"), F.col("lon"), 37.77, -122.42, 3_000_000.0))
        return out.select(
            "c_custkey",
            F.floor(geo_distance_meters(F.col("lat"), F.col("lon"), 37.77, -122.42)).cast("long").alias("dist_m"),
        ).orderBy("c_custkey")

    def geo_box(spark, sf_dir):
        """LatLonPoint.newBoxQuery on quantized coordinates."""
        from lucene_solr_spark.functions.geo import geo_box_predicate

        pts = _cust_points(spark, sf_dir)
        return (
            pts.filter(geo_box_predicate(F.col("lat"), F.col("lon"), -10.0, 35.5, 20.25, 140.0))
            .select("c_custkey")
            .orderBy("c_custkey")
        )

    q["geo_distance"] = geo_distance
    q["geo_box"] = geo_box

    def geo_polygon(spark, sf_dir):
        """LatLonPoint.newPolygonQuery (LatLonPoint.java:253, Polygon2D
        pnpoly crossings): customers inside a concave pentagon with a
        rectangular hole."""
        from lucene_solr_spark.functions.geo import geo_polygon_predicate

        pts = _cust_points(spark, sf_dir)
        return (
            pts.filter(
                geo_polygon_predicate(
                    F.col("lat"), F.col("lon"), POLY_LATS, POLY_LONS, holes=[POLY_HOLE]
                )
            )
            .select("c_custkey")
            .orderBy("c_custkey")
        )

    def geo_distance_feature(spark, sf_dir):
        """LatLonPoint.newDistanceFeatureQuery: distance-decay ranking
        score = (float)(boost·pivot/(pivot+distance)), top 20."""
        from lucene_solr_spark.functions.geo import distance_feature_score

        pts = _cust_points(spark, sf_dir)
        return (
            pts.select(
                "c_custkey",
                distance_feature_score(
                    F.col("lat"), F.col("lon"), 48.85, 2.35, 2_000_000.0, weight=2.0
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("c_custkey"))
            .limit(20)
        )

    q["geo_polygon"] = geo_polygon
    q["geo_distance_feature"] = geo_distance_feature

    # --- shape INDEXING (LatLonShape analog, operators/shapes.py) ---
    # Per-customer diamonds (weighted-L1 balls |dlat| + |dlon|/2 <= r) are
    # tessellated into triangle meshes at index time; the oracles below use
    # closed-form L1 geometry, independent of the triangulation, so they
    # verify the whole tessellate→encode→Rectangle2D pipeline.  The radius
    # grid (k·0.31 + 0.0043) is incommensurate with the 0.01-degree center
    # grid, so no shape sits within ~1e-3 deg of a decision boundary — far
    # above the 4.19e-8 quantization loss and double rounding.
    def _cust_diamonds(spark, sf_dir):
        cust = _load(spark, sf_dir, "customer")
        clat = (F.col("c_custkey") * 7919 % 16000) / F.lit(100.0) - F.lit(80.0)
        clon = (F.col("c_custkey") * 104729 % 34000) / F.lit(100.0) - F.lit(170.0)
        r = (F.col("c_custkey") % 5 + 1) * F.lit(0.31) + F.lit(0.0043)
        return cust.select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.array(clat + r, clat, clat - r, clat).alias("lats"),
            F.array(clon, clon + 2 * r, clon, clon - 2 * r).alias("lons"),
        )

    def _diamond_tris(spark, sf_dir):
        """Tessellated mesh, persisted once per sf_dir (the six shape
        queries share it — index once, query many, like every other index
        in this contract)."""
        from lucene_solr_spark.operators.shapes import shape_triangles

        key = ("diamond_tris", sf_dir)
        if key not in _INDEX_CACHE:
            _INDEX_CACHE[key] = shape_triangles(
                _cust_diamonds(spark, sf_dir), ["c_custkey"]
            ).persist()
        return _INDEX_CACHE[key]

    _SHAPE_BOX = (-10.005, 25.005, 30.005, 90.005)

    def geo_shape_box(spark, sf_dir):
        """LatLonShape.newBoxQuery INTERSECTS (``sandbox/.../document/
        LatLonShape.java:98-101``, ``geo/Rectangle2D.java:111-149``): shapes
        whose tessellated mesh touches the box."""
        from lucene_solr_spark.operators.shapes import shape_box_query

        return shape_box_query(
            _diamond_tris(spark, sf_dir), ["c_custkey"], *_SHAPE_BOX
        ).orderBy("c_custkey")

    def geo_shape_within(spark, sf_dir):
        """WITHIN relation (``LatLonShapeBoundingBoxQuery.java:59-61``
        containsTriangle over every mesh triangle)."""
        from lucene_solr_spark.operators.shapes import shape_box_query

        return shape_box_query(
            _diamond_tris(spark, sf_dir), ["c_custkey"], *_SHAPE_BOX, relation="WITHIN"
        ).orderBy("c_custkey")

    def geo_shape_disjoint(spark, sf_dir):
        """DISJOINT relation: shapes no triangle of which intersects."""
        from lucene_solr_spark.operators.shapes import shape_box_query

        return shape_box_query(
            _diamond_tris(spark, sf_dir), ["c_custkey"], *_SHAPE_BOX, relation="DISJOINT"
        ).orderBy("c_custkey")

    def geo_shape_polygon(spark, sf_dir):
        """LatLonShape.newPolygonQuery INTERSECTS (Polygon2D.relateTriangle):
        query polygon is a diamond with the same L1 weights, so truth is
        Minkowski: intersects ⇔ |dlat| + |dlon|/2 <= r + R."""
        from lucene_solr_spark.operators.shapes import shape_polygon_query

        qlat, qlon, R = 5.1234, -40.5678, 20.0
        return shape_polygon_query(
            _diamond_tris(spark, sf_dir),
            ["c_custkey"],
            [qlat + R, qlat, qlat - R, qlat],
            [qlon, qlon + 2 * R, qlon, qlon - 2 * R],
        ).orderBy("c_custkey")

    def geo_shape_line(spark, sf_dir):
        """Line INDEXING (``LatLonShape.java:83-91`` flat triangles): vertical
        per-customer segments, box INTERSECTS."""
        from lucene_solr_spark.operators.shapes import line_triangles, shape_box_query

        cust = _load(spark, sf_dir, "customer")
        clat = (F.col("c_custkey") * 7919 % 16000) / F.lit(100.0) - F.lit(80.0)
        clon = (F.col("c_custkey") * 104729 % 34000) / F.lit(100.0) - F.lit(170.0)
        r = (F.col("c_custkey") % 5 + 1) * F.lit(0.31) + F.lit(0.0043)
        lines = cust.select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.array(clat, clat + r).alias("lats"),
            F.array(clon, clon).alias("lons"),
        )
        # persist = optimizer barrier: without it the filter pushdown inlines
        # the encode projection into every vertex reference of the (large)
        # Rectangle2D predicate and the generated method exceeds janino's
        # 64 KB limit (production reads triangles from parquet, where the
        # columns are plain attributes and codegen stays intact).  Cached
        # per sf_dir so repeat calls don't stack cached copies.
        key = ("line_tris", sf_dir)
        if key not in _INDEX_CACHE:
            _INDEX_CACHE[key] = line_triangles(lines, ["c_custkey"]).persist()
        tris = _INDEX_CACHE[key]
        return shape_box_query(tris, ["c_custkey"], *_SHAPE_BOX).orderBy("c_custkey")

    def geo_shape_linequery(spark, sf_dir):
        """Line QUERY (``LatLonShapeLineQuery.java``): diamond meshes vs a
        two-segment polyline; per-segment truth is the weighted-L1
        point-to-segment distance."""
        from lucene_solr_spark.operators.shapes import shape_line_query

        return shape_line_query(
            _diamond_tris(spark, sf_dir),
            ["c_custkey"],
            [2.07, 2.07, 30.03],
            [-60.0, -20.0, -20.0],
        ).orderBy("c_custkey")

    q["geo_shape_box"] = geo_shape_box
    q["geo_shape_within"] = geo_shape_within
    q["geo_shape_disjoint"] = geo_shape_disjoint
    q["geo_shape_polygon"] = geo_shape_polygon
    q["geo_shape_line"] = geo_shape_line
    q["geo_shape_linequery"] = geo_shape_linequery

    def tl_igain(spark, sf_dir):
        """FeaturesSelectionStream / igain QParser: top terms by information
        gain about lang='en'; score emitted as the order-free 2^-20
        fixed-point BIGINT of its float32 rounding."""
        from lucene_solr_spark.operators.textml import igain_terms

        s = doc_searcher(spark, sf_dir)
        out = igain_terms(s.index, s.corpus, "lang", "en", top_n=20)
        return out.select(
            "term",
            F.floor(F.col("score").cast("float").cast("double") * 1048576).cast("long").alias("score_q"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
        )

    q["tl_igain"] = tl_igain

    q["ft_classic_topk"] = _sim_search_q(TermQuery(HOT), ClassicSimilarity)
    q["ft_lmdirichlet_topk"] = _sim_search_q(TermQuery(MID), LMDirichletSimilarity)
    q["ft_boolean_sim"] = _sim_search_q(TermQuery(RARE), BooleanSimilarity, k=20)
    q["ft_lmjm_topk"] = _sim_search_q(TermQuery(MID2), LMJelinekMercerSimilarity)
    q["ft_dfr_inl2_topk"] = _sim_search_q(TermQuery(HOT2), DFRInL2Similarity)
    q["ft_dfi_topk"] = _sim_search_q(TermQuery(HOT), DFIChiSquaredSimilarity)
    q["ft_ib_ll_topk"] = _sim_search_q(TermQuery(MID), IBLLSimilarity)
    q["ft_ax_f2exp_topk"] = _sim_search_q(TermQuery(HOT2), AxiomaticF2EXPSimilarity)
    q["ft_ax_f2log_topk"] = _sim_search_q(TermQuery(MID2), AxiomaticF2LOGSimilarity)
    # composable SimilarityBase family — DFR(model, after-effect, norm),
    # IB(distribution, lambda, norm), DFI(independence), Axiomatic F1/F3
    q["ft_dfr_gb1_topk"] = _sim_search_q(
        TermQuery(HOT), lambda: DFRSimilarity(BasicModelG(), AfterEffectB(), NormalizationH1())
    )
    q["ft_dfr_ifb2_topk"] = _sim_search_q(
        TermQuery(MID2), lambda: DFRSimilarity(BasicModelIF(), AfterEffectB(), NormalizationH2())
    )
    q["ft_ib_spl_topk"] = _sim_search_q(
        TermQuery(MID), lambda: IBSimilarity(DistributionSPL(), LambdaTTF(), NormalizationH2())
    )
    q["ft_dfi_sat_topk"] = _sim_search_q(TermQuery(HOT), lambda: DFISimilarity(IndependenceSaturated()))
    q["ft_ax_f1exp_topk"] = _sim_search_q(TermQuery(MID), AxiomaticF1EXPSimilarity)
    q["ft_legacy_bm25_topk"] = _sim_search_q(TermQuery(MID), LegacyBM25Similarity)
    q["ft_multisim_topk"] = _sim_search_q(
        TermQuery(HOT2), lambda: MultiSimilarity([ClassicSimilarity(), BooleanSimilarity()])
    )
    q["ft_ax_f3log_topk"] = _sim_search_q(TermQuery(HOT2), lambda: AxiomaticF3LOGSimilarity(0.25, 1))

    # CommonTermsQuery (queries/CommonTermsQuery.java): df-classified groups —
    # the ~78%-df terms land in the optional high-frequency group, RARE (5%)
    # in the required low-frequency group
    q["ft_common_terms"] = _search_q(
        CommonTermsQuery((HOT, HOT2, MID, RARE), max_term_frequency=0.5)
    )
    # CoveringQuery (sandbox/search/CoveringQuery.java): per-doc minimum
    # clause count from a LongValuesSource (here n_chars % 2 + 1)
    q["ft_covering"] = _search_q(
        CoveringQuery((TermQuery(HOT), TermQuery(HOT2), TermQuery(MID)), "n_chars % 2 + 1")
    )

    def agg_facet_query(spark, sf_dir):
        """facet.query buckets over a base query: counts of (base AND
        bucket), incl. a zero-count bucket, one plan for all buckets."""
        s = doc_searcher(spark, sf_dir)
        out = s.facet_query(
            TermQuery(HOT),
            {
                "has_mid": TermQuery(MID),
                "hot2_and_rare": BooleanQuery.build(must=[TermQuery(HOT2), TermQuery(RARE)]),
                "ghost": TermQuery("zz_no_such_term"),
            },
        )
        return out.orderBy("bucket")

    q["agg_facet_query"] = agg_facet_query

    def ft_high_freq_terms(spark, sf_dir):
        """HighFreqTerms (``reference lucene/misc/.../HighFreqTerms.java``):
        top-20 dictionary terms by totalTermFreq (the -t comparator),
        (freq desc, term desc) reference tie order."""
        s = doc_searcher(spark, sf_dir)
        return s.high_freq_terms(20, order="ttf")

    q["ft_high_freq_terms"] = ft_high_freq_terms

    def ft_terms_enum(spark, sf_dir):
        """TermsComponent: dictionary enumeration, count order, mincount."""
        s = doc_searcher(spark, sf_dir)
        return s.terms_enum(prefix="s", min_count=2, sort="count", limit=15)

    q["ft_terms_enum"] = ft_terms_enum

    def ft_term_vectors(spark, sf_dir):
        """TermVectorComponent / Lucene50TermVectorsFormat: (term, tf) vector
        of three stored documents."""
        s = doc_searcher(spark, sf_dir)
        return s.term_vectors([7, 42, 123]).orderBy("doc_id", "term")

    q["ft_term_vectors"] = ft_term_vectors

    def ft_shingle_topk(spark, sf_dir):
        """ShingleFilter(2,2)+unigrams index: BM25 top-10 for a word-bigram
        term (the shingle 'scan merge'); field length counts unigrams only
        (shingles are posIncr-0 overlaps, discountOverlaps)."""
        from lucene_solr_spark.functions.analysis import shingle_analyzer

        s = alt_searcher(spark, sf_dir, "shingle", shingle_analyzer())
        return _ranked(s.search(TermQuery(f"{HOT} {HOT2}"), 10).df)

    q["ft_shingle_topk"] = ft_shingle_topk

    def ft_common_grams_topk(spark, sf_dir):
        """CommonGramsFilter index (common words a/the): BM25 top-10 for the
        gram 'a_scan' — grams are posIncr-0 overlaps at the first token's
        position, discounted from the field length."""
        from lucene_solr_spark.functions.analysis import common_grams_analyzer

        s = alt_searcher(spark, sf_dir, "commongrams", common_grams_analyzer(("a", "the")))
        return _ranked(s.search(TermQuery(f"a_{HOT}"), 10).df)

    q["ft_common_grams_topk"] = ft_common_grams_topk

    def ft_edge_ngram_topk(spark, sf_dir):
        """EdgeNGramTokenFilter(2,4) index (search-as-you-type): BM25 top-10
        for the prefix gram 'sca'; all grams of a token share its position,
        so the field length counts one gram per emitting token (tokens
        shorter than min_gram emit nothing and count zero)."""
        from lucene_solr_spark.functions.analysis import edge_ngram_analyzer

        s = alt_searcher(spark, sf_dir, "edgegram", edge_ngram_analyzer(2, 4))
        return _ranked(s.search(TermQuery(HOT[:3]), 10).df)

    q["ft_edge_ngram_topk"] = ft_edge_ngram_topk

    def ft_wdgf_topk(spark, sf_dir):
        """WordDelimiterGraphFilter(CATENATE_WORDS) index over the
        hyphenated corpus: BM25 top-10 for the CATENATED term 'scanmerge' —
        tf = odd-boundary ('scan','merge') pairs, dl discounts the
        catenation overlap (it sits at its span's start position)."""
        s = wdgf_searcher(spark, sf_dir)
        return _ranked(s.search(TermQuery(f"{HOT}{HOT2}"), 10).df)

    q["ft_wdgf_topk"] = ft_wdgf_topk

    def ft_wdgf_parts_topk(spark, sf_dir):
        """WDGF generated parts restore the original unigram stream: BM25
        for 'scan' on the WDGF index must equal the plain index's ranking
        (same tf/df/dl after split + graph-position discounting)."""
        s = wdgf_searcher(spark, sf_dir)
        return _ranked(s.search(TermQuery(HOT), 10).df)

    q["ft_wdgf_parts_topk"] = ft_wdgf_parts_topk

    def ft_synmap_topk(spark, sf_dir):
        """SynonymGraphFilter replace-mode index ('sort => key' rule applied
        at index AND query time): BM25 top-10 for the merged term."""
        from lucene_solr_spark.functions.analysis import synonym_analyzer

        s = alt_searcher(spark, sf_dir, "synmap", synonym_analyzer({MID2: MID}))
        return _ranked(s.search(TermQuery(MID), 10).df)

    q["ft_synmap_topk"] = ft_synmap_topk

    def ft_phonetic(spark, sf_dir):
        """PhoneticFilter(Soundex): dictionary terms sounding like 'scann'."""
        s = doc_searcher(spark, sf_dir)
        return s.phonetic_terms("scann", 10)

    q["ft_phonetic"] = ft_phonetic

    def ft_infix_suggest(spark, sf_dir):
        """AnalyzingInfixSuggester: contains-match over the dictionary."""
        s = doc_searcher(spark, sf_dir)
        return s.infix_suggest("or", 10)

    q["ft_infix_suggest"] = ft_infix_suggest

    def ft_word_break(spark, sf_dir):
        """WordBreakSpellChecker: split the run-on '{HOT}{HOT2}' at every
        point where both halves are dictionary terms."""
        s = doc_searcher(spark, sf_dir)
        return s.word_break(HOT + HOT2, 5)

    q["ft_word_break"] = ft_word_break

    def ta_repetition(spark, sf_dir):
        """Gopher-style within-doc repetition signals (training-data
        filtering): duplicate-unigram and top-bigram fractions, 1e-6 fixed
        point — pure codegen, shuffle-free."""
        from lucene_solr_spark.functions.textstats import repetition_stats

        docs = _load(spark, sf_dir, "documents")
        return repetition_stats(docs).orderBy("doc_id")

    q["ta_repetition"] = ta_repetition

    def ft_frange(spark, sf_dir):
        """FunctionRangeQuery / {!frange}: docs whose recip(n_chars) value
        lies in [0.7, 0.9] — a pure Catalyst predicate."""
        s = doc_searcher(spark, sf_dir)
        out = s.frange("recip(n_chars,1,1000,1000)", 0.7, 0.9)
        return out.select(F.col("doc_id").cast("long")).orderBy("doc_id").limit(30)

    q["ft_frange"] = ft_frange

    # SweetSpotSimilarity (lucene/misc): plateau length norm over Classic tf/idf
    q["ft_sweetspot_topk"] = _sim_search_q(TermQuery(HOT), lambda: SweetSpotSimilarity(1, 40, 0.5))

    def ft_diversified(spark, sf_dir):
        """DiversifiedTopDocsCollector: top-10 with at most 2 hits per lang."""
        s = doc_searcher(spark, sf_dir)
        out = s.diversified_topk(TermQuery(HOT), "lang", max_per_key=2, k=10)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.select(
            F.row_number().over(w).cast("int").alias("rank"),
            F.col("doc_id").cast("long"),
            "lang",
        )

    q["ft_diversified"] = ft_diversified

    def agg_docvalues_stats(spark, sf_dir):
        """DocValuesStats (lucene/misc): n_chars stats over the HOT match set."""
        s = doc_searcher(spark, sf_dir)
        return s.docvalues_stats(TermQuery(HOT), "n_chars")

    q["agg_docvalues_stats"] = agg_docvalues_stats

    def ft_elevate(spark, sf_dir):
        """QueryElevationComponent: docs 42 and 7 pinned, doc 3 banned,
        organic BM25 fill."""
        s = doc_searcher(spark, sf_dir)
        return s.elevate(TermQuery(HOT), [42, 7], k=10, exclude_ids=[3])

    q["ft_elevate"] = ft_elevate

    def ft_feature_saturation(spark, sf_dir):
        """FeatureField.newSaturationQuery over n_chars (pivot 256, w 2):
        static-ranking feature with 9-significant-bit quantization."""
        s = doc_searcher(spark, sf_dir)
        top = s.feature_query("n_chars", "saturation", weight=2.0, pivot=256.0, k=15)
        return _ranked(top.df)

    q["ft_feature_saturation"] = ft_feature_saturation

    def ft_batch_search(spark, sf_dir):
        """Batched multi-query retrieval: 3 queries, ONE postings scan
        (offline batch-retrieval pattern; bit-identical to per-query
        search)."""
        s = doc_searcher(spark, sf_dir)
        out = s.batch_search(
            {
                "a": TermQuery(MID),
                "b": BooleanQuery.build(must=[TermQuery(HOT), TermQuery(HOT2)]),
                "c": BooleanQuery.build(should=[TermQuery(MID2), TermQuery(RARE)]),
            },
            k=10,
        )
        return out.select("query_id", "rank", F.col("doc_id").cast("long")).orderBy(
            "query_id", "rank"
        )

    q["ft_batch_search"] = ft_batch_search

    def ltr_linear(spark, sf_dir):
        """Solr LTR LinearModel rerank of the BM25 top-40 (contrib/ltr
        LinearModel.java:117-123, LTRRescorer.java:102-141): float32 dot
        product of normalized features, pure Catalyst codegen."""
        from .operators.ltr import ltr_rescore

        s = doc_searcher(spark, sf_dir)
        top = s.search(TermQuery(HOT), 40)
        return _ranked(ltr_rescore(s, top, _LTR_LINEAR, k=10))

    q["ltr_linear"] = ltr_linear

    def ltr_trees(spark, sf_dir):
        """Solr LTR MultipleAdditiveTreesModel rerank (contrib/ltr
        MultipleAdditiveTreesModel.java:124-183,336-341): weighted regression
        trees with the 1E-6f threshold slack, compiled to CASE WHEN."""
        from .operators.ltr import ltr_rescore

        s = doc_searcher(spark, sf_dir)
        top = s.search(TermQuery(HOT), 40)
        return _ranked(ltr_rescore(s, top, _LTR_TREES, k=10))

    q["ltr_trees"] = ltr_trees

    def ft_freetext(spark, sf_dir):
        """FreeTextSuggester (``lucene/suggest/.../analyzing/
        FreeTextSuggester.java:408-580``): stupid-backoff n-gram LM
        suggestions for the key 'row data s' (trigram model, num=8)."""
        from .operators.freetext import FreeTextSuggester

        key = ("freetext", sf_dir)
        if key not in _INDEX_CACHE:
            corpus = doc_searcher(spark, sf_dir).corpus
            _INDEX_CACHE[key] = FreeTextSuggester.build(corpus, simple_analyzer(), grams=3)
        return _INDEX_CACHE[key].lookup_df(spark, "row data s", 8)

    q["ft_freetext"] = ft_freetext

    def agg_interval_facet(spark, sf_dir):
        """Solr interval facets (``solr/core/.../request/IntervalFacets.
        java``): overlapping open/closed intervals over n_chars for the HOT
        match set — one scan, one aggregation row."""
        s = doc_searcher(spark, sf_dir)
        return s.interval_facet(
            TermQuery(HOT), "n_chars", ["[*,200)", "[100,400)", "[200,800]", "(400,*]"]
        ).orderBy("interval")

    q["agg_interval_facet"] = agg_interval_facet

    def geo_heatmap(spark, sf_dir):
        """facet.heatmap / HeatmapFacetCounter (``lucene/spatial-extras/.../
        prefix/HeatmapFacetCounter.java``): grid counts of the synthetic
        customer points over a 6x8 grid, quantized coordinates."""
        from lucene_solr_spark.functions.geo import heatmap_counts

        pts = _cust_points(spark, sf_dir)
        return heatmap_counts(pts, "lat", "lon", -60.0, 60.0, -120.0, 120.0, 6, 8).orderBy(
            "row", "col"
        )

    q["geo_heatmap"] = geo_heatmap

    def ft_bm25f(spark, sf_dir):
        """BM25FQuery (``lucene/sandbox/.../search/BM25FQuery.java`` +
        ``MultiNormsLeafSimScorer.java``): fields text (w=1) and title
        (= first 5 tokens, w=2) scored as one pseudo field — max-blended df,
        weight-summed ttf/freq, re-quantized blended norms."""
        from .operators.bm25f import bm25f_topk

        idx_text, idx_title = _bm25f_indexes(spark, sf_dir)
        top = bm25f_topk([("text", idx_text, 1.0), ("title", idx_title, 2.0)], [HOT, MID], k=10)
        return _ranked(top)

    q["ft_bm25f"] = ft_bm25f

    def _payload_searcher(spark, sf_dir):
        """`documents` index with the pos&7 per-occurrence payload stream
        (the .pay-file analog), cached per sf_dir."""
        key = ("documents", sf_dir, "payloads")
        if key not in _INDEX_CACHE:
            corpus = doc_searcher(spark, sf_dir).corpus
            idx = build_index(
                corpus,
                IndexConfig(analyzer=simple_analyzer(), n_partitions=8, payload_mode="pos_mod8"),
            ).persist()
            _INDEX_CACHE[key] = IndexSearcher(idx, corpus)
        return _INDEX_CACHE[key]

    def ft_payload_score(spark, sf_dir):
        """PayloadScoreQuery(SpanTermQuery(HOT), AveragePayloadFunction,
        includeSpanScore) — ``lucene/queries/.../payloads/
        PayloadScoreQuery.java`` — over pos&7 payloads."""
        from .operators.payloads import payload_score_topk

        s = _payload_searcher(spark, sf_dir)
        return _ranked(payload_score_topk(s, HOT, function="avg", include_span_score=True, k=10))

    q["ft_payload_score"] = ft_payload_score

    def ft_payload_check(spark, sf_dir):
        """SpanPayloadCheckQuery(SpanTermQuery(MID), [3]) — only occurrences
        whose payload equals 3 survive; surviving count = span freq."""
        from .operators.payloads import payload_check_topk

        s = _payload_searcher(spark, sf_dir)
        return _ranked(payload_check_topk(s, MID, [3], k=10))

    q["ft_payload_check"] = ft_payload_check

    def ft_term_automaton(spark, sf_dir):
        """TermAutomatonQuery accepting "hash join" | "sort merge join"
        (``sandbox/.../TermAutomatonQuery.java`` via the
        ``TokenStreamToTermAutomatonQuery`` union-of-paths shape): freq =
        accepted consecutive-position path count, idf summed over the four
        distinct terms."""
        from .plans.query import TermAutomatonQuery

        s = doc_searcher(spark, sf_dir)
        qy = TermAutomatonQuery.from_phrases(("hash", "join"), ("sort", "merge", "join"))
        return _ranked(s.search(qy, 10).df)

    q["ft_term_automaton"] = ft_term_automaton

    def geo_nearest(spark, sf_dir):
        """LatLonPointPrototypeQueries.nearest (sandbox NearestNeighbor.java):
        the 15 customers closest to (37.77, -122.42), distance asc with id-asc
        tiebreak — per-partition k-heap + k-row merge, never a full sort."""
        from .functions.geo import nearest_neighbors

        pts = _cust_points(spark, sf_dir)
        top = nearest_neighbors(pts, F.col("lat"), F.col("lon"), 37.77, -122.42, k=15)
        return top.select(
            "c_custkey", F.floor(F.col("dist_m")).cast("long").alias("dist_m")
        )

    q["geo_nearest"] = geo_nearest

    def ft_docvalues_terms(spark, sf_dir):
        """DocValuesTermsQuery (sandbox): SORTED doc-values set membership —
        a pushed-down Catalyst IN over the corpus column, constant score."""
        from .plans.query import FieldInSetQuery

        s = doc_searcher(spark, sf_dir)
        stats: dict = {}
        matched = s._evaluate(FieldInSetQuery("lang", ("de", "fr")), 1.0, stats)
        return matched.select(F.col("doc_id").cast("long")).orderBy("doc_id")

    q["ft_docvalues_terms"] = ft_docvalues_terms

    def ft_docvalues_numbers(spark, sf_dir):
        """DocValuesNumbersQuery (sandbox): NUMERIC doc-values set membership."""
        from .plans.query import FieldInSetQuery

        s = doc_searcher(spark, sf_dir)
        matched = s._evaluate(FieldInSetQuery("n_chars", (132, 218, 246)), 1.0, {})
        return matched.select(F.col("doc_id").cast("long")).orderBy("doc_id")

    q["ft_docvalues_numbers"] = ft_docvalues_numbers

    def qb_quality(spark, sf_dir):
        """QualityBenchmark analog (``lucene/benchmark/.../quality/
        QualityBenchmark.java``, ``QualityStats.java``): five single-term
        topics, top-10 BM25 runs, judgments = docs with tf(term) >= 2.
        Exact-integer projection of the stats: ``ap_num`` = Σ over relevant
        ranks of cum_good(r)·(2520/r) — 2520 = lcm(1..10), so AvP =
        ap_num / (2520·max_good) with no float divisions to compare."""
        from .operators.quality import judged_results

        s = doc_searcher(spark, sf_dir)
        topics = [HOT, HOT2, MID, MID2, RARE]
        # all five topic runs in ONE postings scan (batch_search is
        # row-bit-identical to five separate search() calls)
        res = s.batch_search({t: TermQuery(t) for t in topics}, 10).select(
            F.col("query_id").alias("topic"), "rank", F.col("doc_id").cast("long").alias("doc_id")
        )
        toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
        judg = None
        for t in topics:
            tf = F.size(F.filter(toks, lambda x: x == F.lit(t)))
            jt = s.corpus.filter(tf >= 2).select(
                F.lit(t).alias("topic"), F.col("doc_id").cast("long").alias("doc_id")
            )
            judg = jt if judg is None else judg.unionByName(jt)
        j = judged_results(res, judg)
        per = j.groupBy("topic").agg(
            F.max(F.when(F.col("rank") == 10, F.col("cum_good"))).alias("g10"),
            F.sum(
                F.when(F.col("rel") == 1, F.col("cum_good") * (F.lit(2520) / F.col("rank")).cast("long")).otherwise(F.lit(0))
            ).alias("ap_num"),
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("fr"),
        )
        mg = judg.groupBy("topic").agg(F.count("*").alias("max_good"))
        return (
            per.join(mg, "topic", "left")
            .select(
                "topic",
                F.coalesce(F.col("max_good"), F.lit(0)).cast("long").alias("max_good"),
                F.coalesce(F.col("g10"), F.lit(0)).cast("int").alias("good_at_10"),
                F.coalesce(F.col("fr"), F.lit(0)).cast("int").alias("first_rel"),
                F.coalesce(F.col("ap_num"), F.lit(0)).cast("long").alias("ap_num"),
            )
            .orderBy("topic")
        )

    q["qb_quality"] = qb_quality

    def ft_expression(spark, sf_dir):
        """Expressions-module ranking (``lucene/expressions/.../js/
        JavascriptCompiler.java``): compiled JS-like expression over
        ``_score`` + doc values, rational arithmetic only (cross-engine
        bit-exact — no libm)."""
        s = doc_searcher(spark, sf_dir)
        top = s.expression_rescore(
            TermQuery(HOT), "_score * (n_chars >= 200 ? 1.5 : 1.0) + (n_chars % 7) / 10", 10
        )
        return _ranked(top.df)

    q["ft_expression"] = ft_expression

    def _term_entries(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.index.terms.select(
            F.col("term").alias("surface"), F.col("df").cast("long").alias("weight")
        )

    def ft_analyzing_suggest(spark, sf_dir):
        """AnalyzingSuggester over the term dictionary weighted by df
        (``suggest/analyzing/AnalyzingSuggester.java``; EXACT_FIRST)."""
        from .operators.suggesters import AnalyzingSuggester

        sug = AnalyzingSuggester.build(_term_entries(spark, sf_dir), simple_analyzer())
        return sug.lookup("s", 8)

    q["ft_analyzing_suggest"] = ft_analyzing_suggest

    def ft_fuzzy_suggest(spark, sf_dir):
        """FuzzySuggester: one typo allowed in the typed input past the
        protected first character (``FuzzySuggester.java:87-109``)."""
        from .operators.suggesters import FuzzySuggester

        sug = FuzzySuggester.build(_term_entries(spark, sf_dir), simple_analyzer())
        return sug.lookup("scam", 8)

    q["ft_fuzzy_suggest"] = ft_fuzzy_suggest

    def ft_blended_suggest(spark, sf_dir):
        """BlendedInfixSuggester over word-bigram entries weighted by count:
        POSITION_LINEAR blending, small-weight 10x pre-scale, long-truncated
        scores (``BlendedInfixSuggester.java:215-233``)."""
        from .operators.suggesters import AnalyzingSuggester, blended_infix_lookup

        s = doc_searcher(spark, sf_dir)
        toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != F.lit(""))
        bi = s.corpus.select(toks.alias("t")).select(
            F.explode(
                F.expr("transform(slice(t, 1, greatest(size(t)-1, 0)), (x, i) -> concat(x, ' ', t[i+1]))")
            ).alias("surface")
        )
        entries = bi.groupBy("surface").agg(F.count("*").cast("long").alias("weight"))
        sug = AnalyzingSuggester.build(entries, simple_analyzer())
        return blended_infix_lookup(sug, "data", 8)

    q["ft_blended_suggest"] = ft_blended_suggest

    def ft_mlt_exact(spark, sf_dir):
        """Reference-exact MoreLikeThis (``queries/mlt/MoreLikeThis.java``):
        tf>=2 / df>=5 gates, f32(tf·ClassicSimilarity-idf) term ranking,
        top-25 OR query, source doc excluded."""
        s = doc_searcher(spark, sf_dir)
        q2 = s.more_like_this_query(7)
        return _ranked(s.search(q2, 10, exclude_doc_ids=[7]).df)

    q["ft_mlt_exact"] = ft_mlt_exact

    def ft_blockjoin_avg(spark, sf_dir):
        """ToParentBlockJoin ScoreMode.Avg: child BM25 scores averaged per
        source group, top-k parents (score desc, parent asc)."""
        s = doc_searcher(spark, sf_dir)
        return s.block_join_topk(TermQuery(HOT), "source", score_mode="avg", k=10)

    q["ft_blockjoin_avg"] = ft_blockjoin_avg

    def ft_blockjoin_max(spark, sf_dir):
        s = doc_searcher(spark, sf_dir)
        return s.block_join_topk(
            BooleanQuery.build(should=[TermQuery(HOT), TermQuery(MID)]),
            "source",
            score_mode="max",
            k=10,
        )

    q["ft_blockjoin_max"] = ft_blockjoin_max

    def ft_tochild_join(spark, sf_dir):
        """ToChildBlockJoin: parent docs = min doc_id per source; children of
        matching parents inherit the parent's f32 score."""
        s = doc_searcher(spark, sf_dir)
        return _ranked(s.to_child_block_join(TermQuery(HOT), "source", k=10).df)

    q["ft_tochild_join"] = ft_tochild_join

    def ft_dismax_qf(spark, sf_dir):
        """Solr DisMaxQParser (``solr/core/.../search/DisMaxQParser.java``):
        user query "scan merge" over qf=text^1 title^2 (title = first 5
        tokens), tie=0.3, mm=2 (both words), pf=text phrase boost."""
        from .operators.dismax import dismax_search

        s = doc_searcher(spark, sf_dir)
        _, idx_title = _bm25f_indexes(spark, sf_dir)
        fs = {"text": s, "title": IndexSearcher(idx_title)}
        top = dismax_search(
            fs,
            f"{HOT} {HOT2}",
            {"text": 1.0, "title": 2.0},
            tie=0.3,
            mm="2",
            pf={"text": 1.0},
            k=10,
        )
        return _ranked(top)

    q["ft_dismax_qf"] = ft_dismax_qf

    def ft_edismax_pf2(spark, sf_dir):
        """eDisMax shingled phrase boost (``solr/core/.../search/
        ExtendedDismaxQParser.java:291-330,602-667``): 3-word query over
        qf=text^1 title^2 with mm=2, pf2=text — every bigram window a phrase
        boost, windows OR-summed as one SHOULD clause."""
        from .operators.dismax import dismax_search

        s = doc_searcher(spark, sf_dir)
        _, idx_title = _bm25f_indexes(spark, sf_dir)
        fs = {"text": s, "title": IndexSearcher(idx_title)}
        top = dismax_search(
            fs,
            f"{HOT} {HOT2} {MID}",
            {"text": 1.0, "title": 2.0},
            tie=0.3,
            mm="2",
            pf2={"text": 1.0},
            k=10,
        )
        return _ranked(top)

    q["ft_edismax_pf2"] = ft_edismax_pf2

    def ft_unified_highlight(spark, sf_dir):
        """UnifiedHighlighter PassageScorer (``lucene/highlighter/.../
        uhighlight/PassageScorer.java``): all HOT matches re-ranked by the
        passage score of the single (punctuation-free) sentence for query
        terms {HOT, MID}."""
        s = doc_searcher(spark, sf_dir)
        top = s.search(TermQuery(HOT), 1_000_000)
        hl = s.highlight_unified(top, [HOT, MID], max_passages=1)
        # TakeOrderedAndProject first; the rank window then sees 10 rows
        top10 = hl.orderBy(F.desc("hl_score"), F.asc("doc_id")).limit(10)
        w = Window.orderBy(F.desc("hl_score"), F.asc("doc_id"))
        return top10.select(
            F.row_number().over(w).cast("int").alias("rank"),
            F.col("doc_id").cast("long"),
        )

    q["ft_unified_highlight"] = ft_unified_highlight

    def ft_fvh(spark, sf_dir):
        """FastVectorHighlighter (``lucene/highlighter/.../vectorhighlight/
        FastVectorHighlighter.java``): whole-text fragment over the HOT
        top-10 for SHOULD {HOT, MID} — every occurrence tagged in position
        order, ``frag_score`` = SimpleFieldFragList boost sum (= tf sum)."""
        from .operators.fvh import fvh_highlight

        s = doc_searcher(spark, sf_dir)
        top = s.search(TermQuery(HOT), 10)
        bq = BooleanQuery.build(should=[TermQuery(HOT), TermQuery(MID)])
        hl = fvh_highlight(s, top, bq, frag_char_size=4096)
        return hl.select(
            F.col("doc_id").cast("long"),
            "n_frags",
            "frag_score",
            F.element_at("fragments", 1).alias("fragment"),
        ).orderBy("doc_id")

    q["ft_fvh"] = ft_fvh

    def ft_fvh_phrase(spark, sf_dir):
        """FVH phrase path (``FieldPhraseList.java:68-122`` longest match +
        ``WeightedPhraseInfo`` Toffs merging): the adjacent pair HOT HOT2 is
        tagged as ONE merged span per occurrence; ``frag_score`` = phrase
        count (boost 1 per match)."""
        from .operators.fvh import fvh_highlight

        s = doc_searcher(spark, sf_dir)
        pq = PhraseQuery((HOT, HOT2))
        top = s.search(pq, 10)
        hl = fvh_highlight(s, top, pq, frag_char_size=4096)
        return hl.select(
            F.col("doc_id").cast("long"),
            "n_frags",
            "frag_score",
            F.element_at("fragments", 1).alias("fragment"),
        ).orderBy("doc_id")

    q["ft_fvh_phrase"] = ft_fvh_phrase

    def ft_simple_parse(spark, sf_dir):
        """SimpleQueryParser (``lucene/queryparser/.../simple/
        SimpleQueryParser.java``): "HOT | MID + RARE" parses to
        +(HOT OR MID) +RARE with the op-change wrap; searched end-to-end."""
        from .plans.simple_parser import SimpleQueryParser

        s = doc_searcher(spark, sf_dir)
        q2 = SimpleQueryParser(s.index.config.analyzer).parse(f"{HOT} | {MID} + {RARE}")
        return _ranked(s.search(q2, 10).df)

    q["ft_simple_parse"] = ft_simple_parse

    def ft_span_multiterm(spark, sf_dir):
        """SpanMultiTermQueryWrapper (``search/spans/
        SpanMultiTermQueryWrapper.java``): prefix 'sca*' expanded to SpanOr
        alternatives inside an ordered SpanNear with HOT2, slop 1."""
        from .plans.query import SpanMultiTermWrapper, SpanNearQuery

        s = doc_searcher(spark, sf_dir)
        q2 = SpanNearQuery(
            (SpanMultiTermWrapper(PrefixQuery("sca")), HOT2), slop=1, in_order=True
        )
        top = s.search(q2, 30)
        return top.df.select(F.col("doc_id").cast("long")).orderBy("doc_id")

    q["ft_span_multiterm"] = ft_span_multiterm

    def ft_span_posrange(spark, sf_dir):
        """SpanPositionRangeQuery (``search/spans/SpanPositionRangeQuery
        .java``): HOT spans with 2 <= start and end <= 6."""
        from .plans.query import SpanPositionRangeQuery

        s = doc_searcher(spark, sf_dir)
        top = s.search(SpanPositionRangeQuery(HOT, 2, 6), 30)
        return top.df.select(F.col("doc_id").cast("long")).orderBy("doc_id")

    q["ft_span_posrange"] = ft_span_posrange

    def ft_edismax_ops(spark, sf_dir):
        """eDisMax boolean user syntax (``ExtendedDismaxQParser.java:
        722-848`` clause split): "+HOT MID -RARE" = required HOT, optional
        MID adding score, RARE excluded; qf=text."""
        from .operators.dismax import edismax_search

        s = doc_searcher(spark, sf_dir)
        top = edismax_search(
            {"text": s}, f"+{HOT} {MID} -{RARE}", {"text": 1.0}, mm="0", k=10
        )
        return _ranked(top)

    q["ft_edismax_ops"] = ft_edismax_ops

    def pc_percolate(spark, sf_dir):
        """Percolation (``lucene/memory/.../MemoryIndex.java:178`` single-doc
        matching + monitor-pattern trigger pruning): three registered queries
        matched against the whole documents stream in one Arrow pass."""
        from .operators.percolator import Percolator

        s = doc_searcher(spark, sf_dir)
        p = Percolator(
            {
                "term_hot": TermQuery(HOT),
                "mid_not_hot": BooleanQuery.build(must=[TermQuery(MID)], must_not=[TermQuery(HOT)]),
                "phrase": PhraseQuery((HOT, HOT2)),
            },
            s.index.config.analyzer,
        )
        return p.match(s.corpus).orderBy("doc_id", "query_id")

    q["pc_percolate"] = pc_percolate

    def ft_spell_collate(spark, sf_dir):
        """SpellCheckCollator (``solr/core/.../spelling/SpellCheckCollator
        .java``): 'scann kei' → suggestion substitution, cross-product tries,
        hit-verified collations (hits desc, try order asc)."""
        s = doc_searcher(spark, sf_dir)
        return s.spellcheck_collate(["scann", "kei"])

    q["ft_spell_collate"] = ft_spell_collate

    # ---- index-maintenance lifecycle (deletes / expunge / merge / split /
    # replication): §2.2 rows previously pytest-only, now driver-checked.
    def _deleted_searcher(spark, sf_dir):
        """Searcher with live deletes: every doc matching RARE is deleted
        (IndexWriter.deleteDocuments(Query); stats intentionally keep
        counting deleted docs until merge — searcher.delete_by_query)."""
        key = ("deleted", sf_dir)
        if key not in _INDEX_CACHE:
            from dataclasses import replace as _dc_replace

            s = doc_searcher(spark, sf_dir)
            s2 = IndexSearcher(_dc_replace(s.index, deletes=None), s.corpus)
            s2.delete_by_query(TermQuery(RARE))
            _INDEX_CACHE[key] = s2
        return _INDEX_CACHE[key]

    def ft_deletes_topk(spark, sf_dir):
        """Live-docs exclusion (``reference lucene/core/.../index/
        IndexWriter.java:1276`` deleteDocuments + LiveDocs bitset skip at
        collect time): docs containing RARE are deleted, then a SHOULD
        query runs — deleted docs never surface, but BM25 stats still count
        them (the reference's exact pre-merge semantics)."""
        s2 = _deleted_searcher(spark, sf_dir)
        return _ranked(
            s2.search(BooleanQuery.build(should=[TermQuery(HOT), TermQuery(MID)]), 10).df
        )

    q["ft_deletes_topk"] = ft_deletes_topk

    def ft_expunge_topk(spark, sf_dir):
        """Distributed delete reclamation (``SegmentMerger`` skipping
        non-live docs; merge.expunge_deletes_distributed — delete ids never
        pass through the driver): after expunge, doc_count / avgdl / df are
        recomputed WITHOUT the deleted docs, so scores shift vs
        ft_deletes_topk — the oracle rebuilds all stats over the surviving
        corpus only."""
        key = ("expunged", sf_dir)
        if key not in _INDEX_CACHE:
            from .operators.merge import expunge_deletes_distributed

            s2 = _deleted_searcher(spark, sf_dir)
            idx3 = expunge_deletes_distributed(s2.index).persist()
            _INDEX_CACHE[key] = IndexSearcher(idx3, s2.corpus)
        return _ranked(_INDEX_CACHE[key].search(TermQuery(HOT), 10).df)

    q["ft_expunge_topk"] = ft_expunge_topk

    def ft_merged_topk(spark, sf_dir):
        """forceMerge(1) (``reference lucene/core/.../index/IndexWriter.java
        forceMerge`` via TieredMergePolicy maxMergeAtOnceExplicit): all
        postings runs merged to ONE, results bit-identical to the unmerged
        index; n_runs pins that the merge actually collapsed the runs."""
        key = ("merged", sf_dir)
        if key not in _INDEX_CACHE:
            from .operators.merge import force_merge

            s = doc_searcher(spark, sf_dir)
            _INDEX_CACHE[key] = IndexSearcher(force_merge(s.index).persist(), s.corpus)
        ms = _INDEX_CACHE[key]
        n_runs = ms.index.postings.select("run_id").distinct().count()
        top = _ranked(
            ms.search(BooleanQuery.build(should=[TermQuery(HOT2), TermQuery(MID2)]), 10).df
        )
        return top.withColumn("n_runs", F.lit(n_runs).cast("long"))

    q["ft_merged_topk"] = ft_merged_topk

    def ft_tiered_cascade_topk(spark, sf_dir):
        """TieredMergePolicy CASCADE end-to-end (``reference lucene/core/src/
        java/org/apache/lucene/index/TieredMergePolicy.java:380-401``
        allowed-segment budget, ``:566-623`` skew scoring): the index is
        re-sharded into geometrically-halving doc-range runs, then
        ``maybe_merge`` runs the policy loop (segsPerTier=2, maxMergeAtOnce=4,
        floor = total/16, postings-count sizes) until within budget — a
        multi-round cascade whose second merge consumes the first's output.
        Output pins BOTH the search rank identity (merging is
        stats-invariant) and the final run manifest (n_runs + size list);
        the oracle independently replays boundary computation, per-run
        sizes, the floored tier budget, and the skew-scored candidate
        selection as recursive SQL."""
        key = ("tiered_cascade", sf_dir)
        if key not in _INDEX_CACHE:
            from dataclasses import replace as _replace

            from .operators.merge import (
                TieredMergePolicy,
                maybe_merge,
                run_manifest,
                split_index,
            )

            s = doc_searcher(spark, sf_dir)
            n = s.index.doc_count
            bounds, lo = [], 0
            while len(bounds) < 11 and (n - lo) > 3:
                lo += max(1, (n - lo) // 2)
                bounds.append(lo)
            parts = split_index(s.index, bounds)
            post = None
            for i, p in enumerate(parts):
                pi = p.postings.withColumn("run_id", F.lit(i).cast("long"))
                post = pi if post is None else post.unionByName(pi)
            idx = _replace(s.index, postings=post)
            total = sum(r.n_postings for r in run_manifest(idx))
            policy = TieredMergePolicy(
                max_merge_at_once=4,
                segs_per_tier=2.0,
                floor_segment_bytes=max(1, total // 16),
                max_merged_segment_bytes=1 << 60,
            )
            merged = maybe_merge(idx, policy, size_by="postings")
            man = run_manifest(merged)
            # the 12-way part union multiplies partition counts (12 parts x
            # input partitions -> 224 at sf0.1); coalesce the cached result
            # so warm searches pay one task wave, not seven
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
            _INDEX_CACHE[key] = (
                IndexSearcher(
                    _replace(merged, postings=merged.postings.coalesce(n_part).persist()),
                    s.corpus,
                ),
                len(man),
                ",".join(str(v) for v in sorted((r.n_postings for r in man), reverse=True)),
            )
        ms, n_runs, sizes = _INDEX_CACHE[key]
        top = _ranked(
            ms.search(BooleanQuery.build(should=[TermQuery(HOT2), TermQuery(MID2)]), 10).df
        )
        return top.withColumn("n_runs", F.lit(n_runs).cast("long")).withColumn(
            "sizes", F.lit(sizes)
        )

    q["ft_tiered_cascade_topk"] = ft_tiered_cascade_topk

    def ft_shard_local_topk(spark, sf_dir):
        """Index split + LOCAL statistics (``reference lucene/misc/.../index/
        PKIndexSplitter.java``; contrast ft_distributed_topk, which splits
        the same way but fixes stats globally via ExactStatsCache): shard 0
        = doc_id < N/2, searched standalone, so idf/avgdl come from the
        shard alone — the very stats skew distributed search must correct."""
        key = ("shard0", sf_dir)
        if key not in _INDEX_CACHE:
            from .operators.merge import split_index

            s = doc_searcher(spark, sf_dir)
            half = s.index.doc_count // 2
            _INDEX_CACHE[key] = IndexSearcher(
                split_index(s.index, [half])[0].persist(), s.corpus
            )
        return _ranked(_INDEX_CACHE[key].search(TermQuery(MID), 10).df)

    q["ft_shard_local_topk"] = ft_shard_local_topk

    def ft_replica_topk(spark, sf_dir):
        """Replicator round-trip (``reference lucene/replicator/.../
        Replicator.java`` publish → client updateNow → atomic manifest
        switch): the index is committed to disk, published as a revision,
        replicated file-by-file to a fresh directory, read back, and
        searched — results bit-identical to the source index."""
        key = ("replica", sf_dir)
        if key not in _INDEX_CACHE:
            import tempfile

            from .operators.indexer import InvertedIndex
            from .operators.replicator import publish_revision, replicate

            s = doc_searcher(spark, sf_dir)
            src = tempfile.mkdtemp(prefix="idx_primary_")
            dst = tempfile.mkdtemp(prefix="idx_replica_")
            s.index.write(src)
            publish_revision(src)
            replicate(src, dst)
            ridx = InvertedIndex.read(spark, dst, s.index.config).persist()
            _INDEX_CACHE[key] = IndexSearcher(ridx, s.corpus)
        return _ranked(
            _INDEX_CACHE[key].search(
                BooleanQuery.build(should=[TermQuery(HOT), TermQuery(RARE)]), 10
            ).df
        )

    q["ft_replica_topk"] = ft_replica_topk

    def ing_versioned(spark, sf_dir):
        """Versioned updateDocuments (``reference solr/core/.../update/
        processor/DistributedUpdateProcessor.java`` version resolution +
        IndexWriter.java:1276 delete-then-add): per doc the HIGHEST version
        wins across base ∪ updates, equal versions going to the update.
        Updates target doc_id % 5 == 0 with versions above (%15), equal
        (%10), or below (other %5) the base's — exercising all three
        resolution outcomes."""
        from .sources.ingest import apply_updates

        docs = _load(spark, sf_dir, "documents")
        base = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit("base").alias("src"),
            F.col("n_chars").cast("long").alias("version"),
        )
        bump = (
            F.when(F.col("doc_id") % 15 == 0, F.lit(7))
            .when(F.col("doc_id") % 10 == 0, F.lit(0))
            .otherwise(F.lit(-3))
        )
        upd = docs.filter(F.col("doc_id") % 5 == 0).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit("update").alias("src"),
            (F.col("n_chars") + bump).cast("long").alias("version"),
        )
        out = apply_updates(base, upd, id_cols=("doc_id",), version_col="version")
        return out.select("doc_id", "src", "version").orderBy("doc_id")

    q["ing_versioned"] = ing_versioned
    return q


_TITLE_EXPR = "array_join(slice(regexp_extract_all(lower(text), '[a-z0-9]+', 0), 1, 5), ' ')"


def _bm25f_indexes(spark, sf_dir):
    """(text index, title index) over `documents`; title = first 5 tokens."""
    key = ("documents", sf_dir, "bm25f_title")
    if key not in _INDEX_CACHE:
        s = doc_searcher(spark, sf_dir)
        corpus = s.corpus.withColumn("title", F.expr(_TITLE_EXPR))
        idx_title = build_index(
            corpus, IndexConfig(analyzer=simple_analyzer(), text_col="title", n_partitions=8)
        ).persist()
        _INDEX_CACHE[key] = (s.index, idx_title)
    return _INDEX_CACHE[key]


# ------------------------------------------------------- LTR model fixtures
def _ltr_models():
    from .operators.ltr import (
        FieldValueFeature,
        LinearModel,
        MinMaxNormalizer,
        MultipleAdditiveTreesModel,
        OriginalScoreFeature,
        TreeNode,
    )

    f_orig = OriginalScoreFeature("orig", MinMaxNormalizer(0.0, 4.0))
    f_nch = FieldValueFeature("nch", MinMaxNormalizer(0.0, 1024.0), field="n_chars")
    linear = LinearModel(features=(f_orig, f_nch), weights={"orig": 0.7, "nch": 0.3})

    f_orig_i = OriginalScoreFeature("orig")
    f_nch_i = FieldValueFeature("nch", field="n_chars")
    t1 = TreeNode.split(
        "nch",
        300.0,
        left=TreeNode.split("orig", 1.2, left=TreeNode.leaf(0.05), right=TreeNode.leaf(0.35)),
        right=TreeNode.split("orig", 0.9, left=TreeNode.leaf(0.15), right=TreeNode.leaf(0.75)),
    )
    t2 = TreeNode.split("nch", 600.0, left=TreeNode.leaf(0.2), right=TreeNode.leaf(0.6))
    trees = MultipleAdditiveTreesModel(features=(f_orig_i, f_nch_i), trees=((1.0, t1), (0.5, t2)))
    return linear, trees


_LTR_LINEAR, _LTR_TREES = _ltr_models()


def ft_oracle_sql() -> dict:
    o: dict = {}

    o["ft_term_topk"] = _with([_term_cte("sc", HOT)], _topk_sql("SELECT doc_id, score FROM sc"))
    o["ft_term_rare_topk"] = _with([_term_cte("sc", RARE)], _topk_sql("SELECT doc_id, score FROM sc"))
    # bloom-pruned scan is result-identical to the plain term scan
    o["ft_bloom_topk"] = _with([_term_cte("sc", MID2)], _topk_sql("SELECT doc_id, score FROM sc"))
    # sharded-with-global-stats search is bit-identical to the undivided index
    o["ft_distributed_topk"] = _with([_term_cte("sc", HOT)], _topk_sql("SELECT doc_id, score FROM sc"))

    # MUST+MUST: double-sum of the two float32 clause scores, cast back to f32
    and_sum = _R(_D("a.score") + " + " + _D("b.score"))
    and_body = f"SELECT a.doc_id AS doc_id, {and_sum} AS score FROM sa a JOIN sb b USING (doc_id)"
    o["ft_bool_and"] = _with([_term_cte("sa", HOT), _term_cte("sb", HOT2)], _topk_sql(and_body))

    dsum = _R("sum(" + _D("score") + ")")
    or_body = (
        f"SELECT doc_id, {dsum} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) GROUP BY doc_id"
    )
    o["ft_bool_or"] = _with([_term_cte("sa", MID), _term_cte("sb", RARE)], _topk_sql(or_body))

    mm_body = (
        f"SELECT doc_id, {dsum} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb UNION ALL SELECT * FROM sd) "
        "GROUP BY doc_id HAVING count(*) >= 2"
    )
    o["ft_minshouldmatch"] = _with(
        [_term_cte("sa", HOT), _term_cte("sb", MID), _term_cte("sd", RARE)], _topk_sql(mm_body)
    )

    mn_body = "SELECT doc_id, score FROM sa WHERE doc_id NOT IN (SELECT doc_id FROM sb)"
    o["ft_must_not"] = _with([_term_cte("sa", RARE), _term_cte("sb", HOT)], _topk_sql(mn_body))

    # flexible parse "scan sort ! dup" under AND default: +scan +sort -dup
    flex_body = (
        f"SELECT doc_id, {dsum} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) "
        "WHERE doc_id NOT IN (SELECT doc_id FROM sd) "
        "GROUP BY doc_id HAVING count(*) = 2"
    )
    o["ft_flexible_parse"] = _with(
        [_term_cte("sa", HOT), _term_cte("sb", MID2), _term_cte("sd", RARE)],
        _topk_sql(flex_body),
    )

    # phrase: reconstruct the token string, double the separators so
    # consecutive occurrences stay countable, count '  '-separated adjacency
    phrase_cte = (
        "ph AS (SELECT doc_id, "
        f"len(regexp_extract_all(' ' || replace(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' '), ' ', '  ') || ' ', "
        f"' {HOT}  {HOT2} ')) AS ptf FROM documents)"
    )
    # phrase weight: f32( f64(idf_a_f32) + f64(idf_b_f32) ), then BM25 with tf=ptf
    idf_a = _idf(f"(SELECT df FROM dfreq WHERE term = '{HOT}')")
    idf_b = _idf(f"(SELECT df FROM dfreq WHERE term = '{HOT2}')")
    w_phrase = _R(_D(idf_a) + " + " + _D(idf_b))
    ph_t32 = _R(f"ph.ptf / (ph.ptf + {_D(_CACHE)})")
    ph_score = _R(w_phrase + " * " + ph_t32)
    ph_body = (
        f"SELECT ph.doc_id AS doc_id, {ph_score} AS score "
        "FROM ph JOIN dlq ON ph.doc_id = dlq.doc_id WHERE ph.ptf > 0"
    )
    o["ft_phrase"] = _with([phrase_cte], _topk_sql(ph_body))

    # sloppy phrase (slop=2): independent SQL replay of the two-stream
    # SloppyPhraseMatcher walk (nextMatch:120-152) as a recursive CTE — one
    # recursion step per advancePP; emit matchLength on boundary crossings
    # and exhaustion; float32 left-fold of 1f/(1f+ml) in emission order;
    # BM25 with the float freq (PhraseScorer.java:71-77).  Streams: a =
    # HOT positions (offset 0), b = HOT2 positions − 1 (offset 1); ties in
    # the pop go to the lower offset, exactly PhraseQueue's (position,
    # offset, ord) key.  Fuzz-pinned vs the engine matcher on 5000 random
    # position configurations plus the full corpus at both scales.
    _sl_slop = 2
    _sl_walk = f"""
toksl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS lst FROM documents),
posn AS (SELECT doc_id, unnest(lst) AS term, unnest(range(1, len(lst)+1)) - 1 AS pos FROM toksl),
spa AS (SELECT doc_id, list(pos ORDER BY pos) AS la FROM posn WHERE term = '{HOT}' GROUP BY doc_id),
spb AS (SELECT doc_id, list(pos - 1 ORDER BY pos) AS lb FROM posn WHERE term = '{HOT2}' GROUP BY doc_id),
spc AS (SELECT spa.doc_id, la, lb FROM spa JOIN spb USING (doc_id)),
walk(doc_id, la, lb, ia, ib, sel, ml, end_, emit, step, done) AS (
  SELECT doc_id, la, lb, 1, 1,
         CASE WHEN la[1] <= lb[1] THEN 0 ELSE 1 END,
         greatest(la[1], lb[1]) - least(la[1], lb[1]),
         greatest(la[1], lb[1]),
         CAST(NULL AS BIGINT), 0, FALSE
  FROM spc
  UNION ALL
  SELECT doc_id, la, lb,
         CASE WHEN exhausted THEN ia ELSE new_ia END,
         CASE WHEN exhausted THEN ib ELSE new_ib END,
         CASE WHEN exhausted THEN sel WHEN branch1 THEN repop_sel ELSE sel END,
         CASE WHEN exhausted THEN ml WHEN branch1 THEN repop_ml ELSE least(ml, new_end - p) END,
         CASE WHEN exhausted THEN end_ ELSE new_end END,
         CASE WHEN (exhausted OR branch1) AND ml <= {_sl_slop} THEN ml END,
         step + 1,
         exhausted
  FROM (
    SELECT *,
           greatest(end_, p) AS new_end,
           (NOT exhausted AND p > other_pos) AS branch1,
           CASE WHEN la[CAST(new_ia AS INT)] <= lb[CAST(new_ib AS INT)] THEN 0 ELSE 1 END AS repop_sel,
           greatest(end_, p) - least(la[CAST(new_ia AS INT)], lb[CAST(new_ib AS INT)]) AS repop_ml
    FROM (
      SELECT *,
             CASE WHEN sel = 0 THEN ia + 1 > len(la) ELSE ib + 1 > len(lb) END AS exhausted,
             CASE WHEN sel = 0 THEN least(ia + 1, len(la)) ELSE ia END AS new_ia,
             CASE WHEN sel = 1 THEN least(ib + 1, len(lb)) ELSE ib END AS new_ib,
             CASE WHEN sel = 0 THEN la[CAST(least(ia + 1, len(la)) AS INT)]
                  ELSE lb[CAST(least(ib + 1, len(lb)) AS INT)] END AS p,
             CASE WHEN sel = 0 THEN lb[CAST(ib AS INT)] ELSE la[CAST(ia AS INT)] END AS other_pos
      FROM walk WHERE NOT done
    )
  )
),
sw AS (SELECT doc_id, list({_R(_R('1') + ' / ' + _R('1 + emit'))} ORDER BY step) AS lw
       FROM walk WHERE emit IS NOT NULL GROUP BY doc_id),
sfreq AS (SELECT doc_id, list_reduce(lw, (x, y) -> CAST(x + y AS REAL)) AS freq FROM sw)
"""
    _sl_body = (
        "SELECT s.doc_id AS doc_id, "
        + _R(w_phrase + " * " + _R(_D("s.freq") + " / (" + _D("s.freq") + " + " + _D(_CACHE) + ")"))
        + " AS score FROM sfreq s JOIN dlq ON s.doc_id = dlq.doc_id WHERE s.freq > 0"
    )
    o["ft_phrase_sloppy"] = (
        "WITH RECURSIVE "
        + _BASE.strip().rstrip(",")
        + ",\n"
        + _sl_walk.strip().rstrip(",")
        + "\n"
        + _topk_sql(_sl_body)
    )

    # FVH phrase path: top-10 phrase winners, whole-text fragment; each
    # adjacent "HOT HOT2" pair is one merged tag span (Toffs merge), count =
    # the same non-overlapping ptf the phrase scorer uses.  Single-space
    # token geometry (verified: corpus is /[a-z0-9 ]/ single-spaced) makes
    # the char-offset tagging equal to a word-boundary regex replace.
    o["ft_fvh_phrase"] = _with(
        [
            phrase_cte,
            f"pt AS (SELECT doc_id, ptf FROM ({ph_body}) b JOIN ph USING (doc_id) "
            "ORDER BY b.score DESC, doc_id ASC LIMIT 10)",
        ],
        "SELECT CAST(pt.doc_id AS BIGINT) AS doc_id, 1 AS n_frags, "
        "CAST(pt.ptf AS REAL) AS frag_score, "
        f"regexp_replace(d.text, '\\b({HOT} {HOT2})\\b', '<b>\\1</b>', 'g') AS fragment "
        "FROM pt JOIN documents d ON pt.doc_id = d.doc_id ORDER BY doc_id",
    )

    # synonym: blended df = max over synonyms, tf summed per doc
    syn_cte = (
        f"syn AS (SELECT doc_id, sum(tf) AS tf FROM tf WHERE term IN ('{MID}', '{MID2}') GROUP BY doc_id),"
        f"syndf AS (SELECT max(df) AS df FROM dfreq WHERE term IN ('{MID}', '{MID2}'))"
    )
    syn_t32 = _R(f"syn.tf / (syn.tf + {_D(_CACHE)})")
    syn_score = _R(_idf("(SELECT df FROM syndf)") + " * " + syn_t32)
    syn_body = (
        f"SELECT syn.doc_id AS doc_id, {syn_score} AS score "
        "FROM syn JOIN dlq ON syn.doc_id = dlq.doc_id"
    )
    o["ft_synonym"] = _with([syn_cte], _topk_sql(syn_body))

    dmax = "max(" + _D("score") + ")"
    dtot = "sum(" + _D("score") + ")"
    dm_score = _R(f"{dmax} + 0.3 * ({dtot} - {dmax})")
    dm_body = (
        f"SELECT doc_id, {dm_score} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) GROUP BY doc_id"
    )
    o["ft_dismax"] = _with([_term_cte("sa", MID), _term_cte("sb", RARE)], _topk_sql(dm_body))

    # BlendedTermQuery: df blended to max over both terms, per-term boosts,
    # DisjunctionMax(tie = (float)0.01) combine
    _bl_t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    _bl_idf = _idf("(SELECT df FROM bdf)")

    def _bl_cte(alias: str, term: str, boost: str) -> str:
        w = _R(f"{boost} * {_bl_idf}") if boost != "1.0" else _bl_idf
        return (
            f"{alias} AS (SELECT tf.doc_id AS doc_id, {_R(f'{w} * {_bl_t32}')} AS score "
            f"FROM tf JOIN dlq ON tf.doc_id = dlq.doc_id WHERE tf.term = '{term}')"
        )

    import numpy as _np

    _bl_tie = repr(float(_np.float32(0.01)))
    _bl_score = _R(f"{dmax} + {_bl_tie} * ({dtot} - {dmax})")
    o["ft_blended"] = _with(
        [
            f"bdf AS (SELECT max(df) AS df FROM dfreq WHERE term IN ('{MID}', '{RARE}'))",
            _bl_cte("ba", MID, "1.0"),
            _bl_cte("bb", RARE, "2.0"),
        ],
        _topk_sql(
            f"SELECT doc_id, {_bl_score} AS score "
            "FROM (SELECT * FROM ba UNION ALL SELECT * FROM bb) GROUP BY doc_id"
        ),
    )

    o["ft_prefix"] = _with(
        [],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM "
        "(SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'sc%') ORDER BY doc_id LIMIT 20",
    )
    o["ft_count"] = _with([], f"SELECT CAST(count(*) AS BIGINT) AS cnt FROM tf WHERE term = '{HOT}'")
    o["ft_stats"] = _with(
        [],
        "SELECT (SELECT n FROM st) AS doc_count, CAST((SELECT sttf FROM st) AS BIGINT) AS sum_ttf",
    )
    o["ft_terms_stats"] = _with(
        [],
        "SELECT tf.term AS term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf.tf) AS BIGINT) AS ttf "
        f"FROM tf WHERE tf.term IN ('{HOT}', '{HOT2}', '{MID}', '{MID2}', '{RARE}') "
        "GROUP BY tf.term ORDER BY tf.term",
    )

    # ---- MultiTermQuery family: constant-score doc-id sets (first 30 ids)
    def _const_sql(term_pred: str, limit: int = 30) -> str:
        return _with(
            [],
            "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM "
            f"(SELECT DISTINCT doc_id FROM tf WHERE {term_pred}) ORDER BY doc_id LIMIT {limit}",
        )

    o["ft_wildcard"] = _const_sql("term LIKE 's_an'")
    o["ft_regexp"] = _const_sql("regexp_full_match(term, 's[ck]an|sort')")
    o["ft_term_range"] = _const_sql("term >= 'scan' AND term < 'sort'")
    o["ft_term_in_set"] = _const_sql(f"term IN ('{HOT}', '{MID2}', '{RARE}')")
    o["ft_fuzzy"] = _const_sql("levenshtein(term, 'scann') <= 1")

    # fuzzy scoring rewrite: per-term f32 boost 1 - ed/min(|t|,|q|), top-50 by
    # (boost desc, term asc), blended df = max(df), SHOULD-sum
    # (FuzzyTermsEnum.java:230-237, TopTermsRewrite.java:202-207,
    # BlendedTermQuery.java:133,275-284)
    fz_t, fz_n = "scann", len("scann")
    fz_div = _R(f"CAST(levenshtein(term, '{fz_t}') AS REAL) / CAST(least(length(term), {fz_n}) AS REAL)")
    fz_b = f"CASE WHEN term = '{fz_t}' THEN CAST(1.0 AS REAL) ELSE {_R(f'1.0 - {fz_div}')} END"
    fz_t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    fz_w = _R(f"ftop.b * {_idf('(SELECT df FROM fbdf)')}")
    o["ft_fuzzy_scored"] = _with(
        [
            f"fcand AS (SELECT term, df, {fz_b} AS b FROM dfreq WHERE levenshtein(term, '{fz_t}') <= 2)",
            "ftop AS (SELECT * FROM fcand ORDER BY b DESC, term ASC LIMIT 50)",
            "fbdf AS (SELECT max(df) AS df FROM ftop)",
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"CAST(SUM(CAST({_R(f'{fz_w} * {fz_t32}')} AS DOUBLE)) AS REAL) AS score "
            f"FROM tf JOIN ftop USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"GROUP BY tf.doc_id)"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # more-like-this: OR of doc 7's top-5 tf terms, doc 7 excluded
    t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    per_term_score = _R(f"{_idf('dfreq.df')} * {t32}")
    mlt_ctes = [
        "mlt AS (SELECT term FROM tf WHERE doc_id = 7 ORDER BY tf DESC, term ASC LIMIT 5)",
        "sc AS (SELECT tf.doc_id AS doc_id, "
        f"CAST(sum(CAST({per_term_score} AS DOUBLE)) AS REAL) AS score "
        "FROM tf JOIN mlt USING (term) JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
        "WHERE tf.doc_id <> 7 GROUP BY tf.doc_id)",
    ]
    o["ft_mlt"] = _with(mlt_ctes, _topk_sql("SELECT doc_id, score FROM sc"))

    # reference-exact MLT: interesting-term selection by f32(tf * classic
    # idf) with tf/df gates, then the usual BM25 SHOULD-sum over the top 25
    _mlt2_idf = _R(f"ln(((SELECT n FROM st) + 1) / (df + 1.0)) + 1.0")
    mlt2_ctes = [
        "mcand AS (SELECT tf.term, tf.tf, dfreq.df FROM tf JOIN dfreq USING (term) "
        "WHERE tf.doc_id = 7 AND tf.tf >= 2 AND dfreq.df >= 5)",
        f"msel AS (SELECT term FROM mcand "
        f"ORDER BY {_R(f'tf * {_mlt2_idf}')} DESC, term ASC LIMIT 25)",
        "sc2 AS (SELECT tf.doc_id AS doc_id, "
        f"CAST(sum(CAST({per_term_score} AS DOUBLE)) AS REAL) AS score "
        "FROM tf JOIN msel USING (term) JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
        "WHERE tf.doc_id <> 7 GROUP BY tf.doc_id)",
    ]
    o["ft_mlt_exact"] = _with(mlt2_ctes, _topk_sql("SELECT doc_id, score FROM sc2"))

    # ToParentBlockJoin: per-parent rollup of child f32 scores; Avg = double
    # accumulate / childCount, single f32 cast (ToParentBlockJoinQuery:351-354)
    def _blockjoin_sql(child_cte_alias: str) -> str:
        return (
            "SELECT CAST(row_number() OVER (ORDER BY score DESC, parent ASC) AS INT) AS rank, "
            "parent, n_hits FROM pj ORDER BY score DESC, parent ASC LIMIT 10"
        )

    o["ft_blockjoin_avg"] = _with(
        [
            _term_cte("sc", HOT),
            "pj AS (SELECT d.source AS parent, CAST(count(*) AS BIGINT) AS n_hits, "
            f"{_R('sum(' + _D('sc.score') + ') / count(*)')} AS score "
            "FROM sc JOIN documents d ON sc.doc_id = d.doc_id GROUP BY d.source)",
        ],
        _blockjoin_sql("sc"),
    )

    o["ft_blockjoin_max"] = _with(
        [
            _term_cte("sa", HOT),
            _term_cte("sb", MID),
            f"scd AS (SELECT doc_id, {_R('sum(' + _D('score') + ')')} AS score "
            "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) GROUP BY doc_id)",
            "pj AS (SELECT d.source AS parent, CAST(count(*) AS BIGINT) AS n_hits, "
            "CAST(max(scd.score) AS REAL) AS score "
            "FROM scd JOIN documents d ON scd.doc_id = d.doc_id GROUP BY d.source)",
        ],
        _blockjoin_sql("scd"),
    )

    # ToChildBlockJoin: parent doc = min doc_id per source; children inherit
    # the parent's f32 score verbatim, parent row excluded
    o["ft_tochild_join"] = _with(
        [
            _term_cte("sc", HOT),
            "par AS (SELECT source, min(doc_id) AS pdoc FROM documents GROUP BY source)",
            "psc AS (SELECT par.source AS source, par.pdoc AS pdoc, sc.score AS score "
            "FROM sc JOIN par ON sc.doc_id = par.pdoc)",
            "ch AS (SELECT d.doc_id AS doc_id, psc.score AS score "
            "FROM documents d JOIN psc ON d.source = psc.source WHERE d.doc_id <> psc.pdoc)",
        ],
        _topk_sql("SELECT doc_id, score FROM ch"),
    )

    # grouping / collapse: top-2 per lang over the full HOT match set
    o["ft_group_topk"] = _with(
        [_term_cte("sc", HOT)],
        "SELECT lang, rank, CAST(doc_id AS BIGINT) AS doc_id FROM ("
        "  SELECT d.lang AS lang, sc.doc_id AS doc_id, "
        "  CAST(row_number() OVER (PARTITION BY d.lang ORDER BY sc.score DESC, sc.doc_id ASC) AS INT) AS rank"
        "  FROM sc JOIN documents d ON sc.doc_id = d.doc_id"
        ") WHERE rank <= 2 ORDER BY lang, rank",
    )

    o["ft_facet_lang"] = _with(
        [],
        "SELECT d.lang AS lang, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}') m "
        "JOIN documents d ON m.doc_id = d.doc_id GROUP BY d.lang ORDER BY lang",
    )

    # highlighter: ±2-token snippet around the first occurrence in the top-10
    o["ft_highlight"] = _with(
        [
            _term_cte("sc", HOT),
            "top10 AS (SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT 10)",
            "tks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)",
        ],
        "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, "
        f"array_to_string(k.toks[greatest(1, list_position(k.toks, '{HOT}') - 2) : list_position(k.toks, '{HOT}') + 2], ' ') AS snippet "
        "FROM top10 t JOIN tks k ON t.doc_id = k.doc_id ORDER BY doc_id",
    )

    # FVH whole-text fragment over the HOT top-10 for SHOULD {HOT, MID}:
    # one fragment (window >= text), every occurrence tagged left-to-right,
    # frag_score = SimpleFieldFragList f32 boost sum = tf_HOT + tf_MID
    # (integers, exact in f32).
    o["ft_fvh"] = _with(
        [
            _term_cte("sc", HOT),
            "ftop AS (SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT 10)",
            f"fcnt AS (SELECT doc_id, sum(tf) AS n FROM tf WHERE term IN ('{HOT}', '{MID}') GROUP BY doc_id)",
        ],
        "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, 1 AS n_frags, "
        "CAST(c.n AS REAL) AS frag_score, "
        f"regexp_replace(d.text, '\\b({HOT}|{MID})\\b', '<b>\\1</b>', 'g') AS fragment "
        "FROM ftop t JOIN documents d ON t.doc_id = d.doc_id "
        "JOIN fcnt c ON t.doc_id = c.doc_id ORDER BY doc_id",
    )

    # rescorer: top-20 of HOT, combined with 2.0 * HOT2 score
    combined = _R(_D("t.score") + " + 2.0 * coalesce(" + _D("sb.score") + ", 0.0)")
    o["ft_rescore"] = _with(
        [
            _term_cte("sa", HOT),
            _term_cte("sb", HOT2),
            "t AS (SELECT doc_id, score FROM sa ORDER BY score DESC, doc_id ASC LIMIT 20)",
        ],
        _topk_sql(
            f"SELECT t.doc_id AS doc_id, {combined} AS score FROM t LEFT JOIN sb ON t.doc_id = sb.doc_id",
            k=20,
        ),
    )

    # function score: bm25 * ln(1 + n_chars)
    fs = _R(_D("sc.score") + " * ln(1 + d.n_chars)")
    o["ft_function_score"] = _with(
        [_term_cte("sc", HOT)],
        _topk_sql(f"SELECT sc.doc_id AS doc_id, {fs} AS score FROM sc JOIN documents d ON sc.doc_id = d.doc_id"),
    )

    o["ft_export_sorted"] = _with(
        [],
        "SELECT CAST(m.doc_id AS BIGINT) AS doc_id, CAST(d.n_chars AS BIGINT) AS n_chars "
        f"FROM (SELECT DISTINCT doc_id FROM tf WHERE term = '{MID}') m "
        "JOIN documents d ON m.doc_id = d.doc_id ORDER BY d.n_chars DESC, m.doc_id ASC",
    )

    o["ft_suggest"] = _with(
        [],
        "SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf WHERE term LIKE 'sc%' "
        "GROUP BY term ORDER BY df DESC, term ASC LIMIT 10",
    )

    o["ft_significant"] = _with(
        [],
        "SELECT f.term AS term, CAST(f.fg_df AS BIGINT) AS fg_df, CAST(b.df AS BIGINT) AS bg_df FROM "
        f"(SELECT term, count(*) AS fg_df FROM tf WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = '{RARE}') "
        "GROUP BY term) f JOIN dfreq b USING (term) WHERE b.df >= 5 "
        "ORDER BY (f.fg_df * 1.0 / b.df) DESC, f.fg_df DESC, f.term ASC LIMIT 10",
    )

    o["ft_get"] = (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang FROM documents "
        "WHERE doc_id IN (7, 42, 123) ORDER BY doc_id"
    )

    # ---- span near: token positions via parallel unnest (order-aligned)
    tokp = (
        "tokp AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term, "
        "unnest(generate_series(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS pos FROM documents)"
    )
    o["ft_span_near"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term = '{HOT}' AND b.term = '{HOT2}' AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2"
        ") ORDER BY doc_id LIMIT 30",
    )
    # XML SpanNear with a SpanOrTerms slot: scan then (merge|key), ordered
    o["ft_xml_span"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term = '{HOT}' AND b.term IN ('{HOT2}', '{MID}') AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2"
        ") ORDER BY doc_id LIMIT 30",
    )
    o["ft_complex_phrase"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term = '{HOT2}' AND b.term LIKE 's%' AND b.pos > a.pos AND b.pos - a.pos - 1 <= 0"
        ") ORDER BY doc_id LIMIT 30",
    )
    # ---- reference golden vectors: oracle = the reference's OWN checkHits
    # literals (TestBasics.java), transcribed in functions/span_golden_data.py
    # — a pure VALUES list, no re-derivation of the matcher at all
    def _golden_oracle(case_names) -> str:
        from .functions.span_golden_data import GOLDEN_HITS, GOLDEN_SPAN_NOT

        hits = {**GOLDEN_HITS, **GOLDEN_SPAN_NOT}
        parts = []
        for vname in case_names:
            vals = ", ".join(f"({i})" for i in hits[vname])
            parts.append(
                f"SELECT '{vname}' AS variant, CAST(doc_id AS BIGINT) AS doc_id "
                f"FROM (VALUES {vals}) t(doc_id)"
            )
        return " UNION ALL ".join(parts) + " ORDER BY variant, doc_id"

    o["ft_golden_term_phrase_bool"] = _golden_oracle(
        ["term_seventy", "phrase_seventy_seven", "bool_seventy_seven"]
    )
    o["ft_golden_span_near"] = _golden_oracle(
        [
            "near_exact_seventy_seven",
            "near_ordered_nine_six",
            "near_unordered_nine_six",
            "near_or_six_seven",
            "nested_three_hundred_thirty_three",
            "or_thirtythree_fortyseven",
            "complex1_six_seven_hundred",
        ]
    )
    o["ft_golden_span_pos"] = _golden_oracle(
        ["first_five_1", "posrange_five_1_2", "posrange_five_0_1"]
    )
    o["ft_golden_span_not"] = _golden_oracle(
        [
            "not_eight_one_forty",
            "not_large_window",
            "not_multiple_many",
            "not_near_exclude",
            "not_first_nested",
            "not_window_one",
            "not_window_two_before",
            "not_window_neg_post2",
            "not_window_neg_pre3",
            "not_double_excludes",
        ]
    )
    # FuzzySuggesterTest.java:103-181 testKeyword assertion literals: each
    # lookup's asserted result size (rank -1) and asserted (rank, surface,
    # weight) rows — nothing re-derived
    o["ft_golden_fuzzy_suggest"] = (
        "SELECT variant, CAST(rank AS INT) AS rank, surface, "
        "CAST(weight AS BIGINT) AS weight FROM (VALUES "
        "('fuzzy_bariar', -1, '#size', 2), ('fuzzy_bariar', 1, 'barbar', 12), "
        "('fuzzy_barbr', -1, '#size', 2), ('fuzzy_barbr', 1, 'barbar', 12), "
        "('exact_barbara', -1, '#size', 2), ('exact_barbara', 1, 'barbara', 6), "
        "('exact_barbar', -1, '#size', 2), ('exact_barbar', 1, 'barbar', 12), "
        "('exact_barbar', 2, 'barbara', 6), "
        "('fuzzy_barbaa', -1, '#size', 2), ('fuzzy_barbaa', 1, 'barbar', 12), "
        "('fuzzy_barbaa', 2, 'barbara', 6), "
        "('prefix_f', -1, '#size', 1), ('prefix_f', 1, 'foo', 50), "
        "('exactfirst_bar_n1', -1, '#size', 1), ('exactfirst_bar_n1', 1, 'bar', 10), "
        "('prefix_b', -1, '#size', 2), ('prefix_b', 1, 'barbar', 12), "
        "('prefix_b', 2, 'bar', 10), "
        "('prefix_ba', -1, '#size', 3), ('prefix_ba', 1, 'barbar', 12), "
        "('prefix_ba', 2, 'bar', 10), ('prefix_ba', 3, 'barbara', 6)"
        ") t(variant, rank, surface, weight) ORDER BY variant, rank"
    )

    # TestIntervals.java:176-330 checkIntervals minimal-interval literals
    def _golden_intervals_oracle() -> str:
        from .functions.span_golden_data import GOLDEN_INTERVALS

        vals = ", ".join(
            f"('{vname}', {d}, {s}, {e})"
            for vname, rows in GOLDEN_INTERVALS.items()
            for d, s, e in rows
        )
        return (
            "SELECT variant, CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(start AS INT) AS start, CAST(\"end\" AS INT) AS \"end\" "
            f"FROM (VALUES {vals}) t(variant, doc_id, start, \"end\") "
            "ORDER BY variant, doc_id, start, \"end\""
        )

    o["ft_golden_intervals"] = _golden_intervals_oracle()

    # TestSloppyPhraseQuery.java "Wrong number of hits" literals at every
    # slop boundary the reference's formulas switch on (checkPhraseQuery
    # expectedNumResults, transcribed in phrase_golden_data.SLOPPY_CASES)
    def _golden_sloppy_oracle() -> str:
        from .functions.phrase_golden_data import sloppy_expected_rows

        vals = ", ".join(
            f"('{v}', {slop}, {m})" for v, slop, m in sloppy_expected_rows()
        )
        return (
            "SELECT variant, CAST(slop AS INT) AS slop, "
            "CAST(matched AS INT) AS matched "
            f"FROM (VALUES {vals}) t(variant, slop, matched) "
            "ORDER BY variant, slop"
        )

    o["ft_golden_sloppy_phrase"] = _golden_sloppy_oracle()

    # TestMultiPhraseQuery.java assertEquals hit-count literals
    def _golden_multiphrase_oracle() -> str:
        from .functions.phrase_golden_data import MULTIPHRASE_COUNTS

        vals = ", ".join(
            f"('{v}', {n})" for v, (_tag, n) in sorted(MULTIPHRASE_COUNTS.items())
        )
        return (
            "SELECT variant, CAST(n_hits AS BIGINT) AS n_hits "
            f"FROM (VALUES {vals}) t(variant, n_hits) ORDER BY variant"
        )

    o["ft_golden_multiphrase"] = _golden_multiphrase_oracle()

    # TestJsonFacets assertJQ bucket literals (testMethodStream + the
    # uninvertible where_s buckets), flattened
    def _golden_json_facets_oracle() -> str:
        from .functions.phrase_golden_data import JSON_FACET_EXPECTED

        vals = ", ".join(
            f"('{v}', '{p}', '{b}', {c}, "
            + ("CAST(NULL AS DOUBLE)" if s is None else f"CAST({s} AS DOUBLE)")
            + ")"
            for v, p, b, c, s in JSON_FACET_EXPECTED
        )
        return (
            "SELECT variant, parent, val, CAST(count AS BIGINT) AS count, "
            "CAST(stat AS DOUBLE) AS stat "
            f"FROM (VALUES {vals}) t(variant, parent, val, count, stat) "
            "ORDER BY variant, parent, val"
        )

    o["ft_golden_json_facets"] = _golden_json_facets_oracle()

    # TestFuzzyQuery.testFuzziness assertEquals literals: hit counts per
    # construction + hit-surface orderings where the reference asserts them
    def _golden_fuzzy_query_oracle() -> str:
        from .functions.phrase_golden_data import fuzzy_expected_rows

        vals = ", ".join(
            f"('{v}', {r}, '{sf}', {n})" for v, r, sf, n in fuzzy_expected_rows()
        )
        return (
            "SELECT variant, CAST(rank AS INT) AS rank, surface, "
            "CAST(n AS INT) AS n "
            f"FROM (VALUES {vals}) t(variant, rank, surface, n) "
            "ORDER BY variant, rank"
        )

    o["ft_golden_fuzzy_query"] = _golden_fuzzy_query_oracle()

    # TestUnifiedHighlighter assertEquals snippet-string literals
    def _golden_unified_highlight_oracle() -> str:
        from .functions.phrase_golden_data import highlight_expected_rows

        vals = ", ".join(
            "('{}', '{}')".format(v, sn.replace("'", "''"))
            for v, sn in highlight_expected_rows()
        )
        return (
            "SELECT variant, snippet "
            f"FROM (VALUES {vals}) t(variant, snippet) ORDER BY variant"
        )

    o["ft_golden_unified_highlight"] = _golden_unified_highlight_oracle()

    # TestGroupingSearch assertQ XPath literals (group order, groupValue,
    # numFound, top doc id per group)
    def _golden_grouping_oracle() -> str:
        from .functions.phrase_golden_data import GROUPING_EXPECTED

        vals = ", ".join(
            f"('{v}', {r}, '{g}', {n}, {t})" for v, r, g, n, t in GROUPING_EXPECTED
        )
        return (
            "SELECT variant, CAST(grank AS INT) AS grank, group_value, "
            "CAST(n_found AS BIGINT) AS n_found, CAST(top_id AS BIGINT) AS top_id "
            f"FROM (VALUES {vals}) t(variant, grank, group_value, n_found, top_id) "
            "ORDER BY variant, grank"
        )

    o["ft_golden_grouping"] = _golden_grouping_oracle()

    o["ft_span_near_unordered"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term = '{MID}' AND b.term = '{HOT}' AND a.pos <> b.pos AND abs(b.pos - a.pos) - 1 <= 3"
        ") ORDER BY doc_id LIMIT 30",
    )
    # 3-ary unordered window: max(pos)+1 - min(pos) - 3 <= slop
    o["ft_span_near_unordered3"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id"
        f"  FROM tokp a JOIN tokp b USING (doc_id) JOIN tokp c USING (doc_id)"
        f"  WHERE a.term = '{HOT}' AND b.term = '{MID}' AND c.term = '{MID2}'"
        "  AND greatest(a.pos, b.pos, c.pos) + 1 - least(a.pos, b.pos, c.pos) - 3 <= 4"
        ") ORDER BY doc_id LIMIT 30",
    )
    # surround "(HOT 3W HOT2) OR (MID N MID2)": ordered within-3 union
    # unordered adjacency (distance default 1)
    o["ft_surround"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term = '{HOT}' AND b.term = '{HOT2}' AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2"
        "  UNION"
        f"  SELECT DISTINCT c.doc_id AS doc_id FROM tokp c JOIN tokp d USING (doc_id)"
        f"  WHERE c.term = '{MID}' AND d.term = '{MID2}' AND c.pos <> d.pos AND abs(d.pos - c.pos) - 1 <= 0"
        ") ORDER BY doc_id LIMIT 30",
    )
    # surround "(HOT w HOT2) 4w MID": inner exact adjacency (slop 0), outer
    # ordered with total gap <= 3 from the inner span's end (b.pos + 1)
    o["ft_surround_nested"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id"
        f"  FROM tokp a JOIN tokp b USING (doc_id) JOIN tokp c USING (doc_id)"
        f"  WHERE a.term = '{HOT}' AND b.term = '{HOT2}' AND b.pos = a.pos + 1"
        f"  AND c.term = '{MID}' AND c.pos >= b.pos + 1 AND c.pos - (b.pos + 1) <= 3"
        ") ORDER BY doc_id LIMIT 30",
    )
    # span containment: big = ordered near(HOT, HOT2, slop 6) spanning
    # [a.pos, b.pos], little = a MID occurrence at c.pos inside that range;
    # Within(little, big) is the identical document set (constant score)
    _contain_sql = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        "  SELECT DISTINCT a.doc_id AS doc_id"
        "  FROM tokp a JOIN tokp b USING (doc_id) JOIN tokp c USING (doc_id)"
        f"  WHERE a.term = '{HOT}' AND b.term = '{HOT2}' AND c.term = '{MID}'"
        "  AND b.pos > a.pos AND b.pos - a.pos - 1 <= 6"
        "  AND c.pos BETWEEN a.pos AND b.pos"
        ") ORDER BY doc_id LIMIT 30",
    )
    o["ft_span_containing"] = _contain_sql
    o["ft_span_within"] = _contain_sql

    # span multi-term wrapper: prefix-expanded first slot, ordered slop 1
    o["ft_span_multiterm"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term LIKE 'sca%' AND b.term = '{HOT2}' AND b.pos > a.pos AND b.pos - a.pos - 1 <= 1"
        ") ORDER BY doc_id LIMIT 30",
    )
    # span position range: 0-based start in [2, 6-1] <=> 1-based pos in [3, 6]
    o["ft_span_posrange"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT doc_id FROM tokp WHERE term = '{HOT}' AND pos - 1 >= 2 AND pos <= 6"
        ") ORDER BY doc_id LIMIT 30",
    )

    # span first: 1-based tokp pos <= end  <=>  0-based pos + 1 <= end
    o["ft_span_first"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT doc_id FROM tokp WHERE term = '{HOT}' AND pos <= 3"
        ") ORDER BY doc_id LIMIT 30",
    )
    # span not: an include occurrence with no exclude within [p-1, p+1]
    o["ft_span_not"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a WHERE a.term = '{MID}' AND NOT EXISTS ("
        f"    SELECT 1 FROM tokp b WHERE b.doc_id = a.doc_id AND b.term = '{HOT}'"
        f"    AND b.pos BETWEEN a.pos - 1 AND a.pos + 1)"
        ") ORDER BY doc_id LIMIT 30",
    )
    # span or inside near: slot-0 alternatives via IN
    o["ft_span_or_near"] = _with(
        [tokp],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM ("
        f"  SELECT DISTINCT a.doc_id AS doc_id FROM tokp a JOIN tokp b USING (doc_id)"
        f"  WHERE a.term IN ('{MID}', '{MID2}') AND b.term = '{HOT}'"
        f"  AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2"
        ") ORDER BY doc_id LIMIT 30",
    )

    # multi-phrase: ptf = Σ over slot-term combinations of adjacency counts
    # (per start position exactly one combination can match — the token at
    # the second slot's position is unique), doubled separators keep
    # consecutive matches countable; idf summed over ALL slot terms
    mp_cte = (
        "mp AS (SELECT doc_id, "
        f"len(regexp_extract_all(s, ' {HOT}  {HOT2} ')) + len(regexp_extract_all(s, ' {HOT}  {MID2} ')) AS ptf "
        "FROM (SELECT doc_id, ' ' || replace(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' '), ' ', '  ') || ' ' AS s "
        "FROM documents))"
    )
    mp_idf_a = _idf(f"(SELECT df FROM dfreq WHERE term = '{HOT}')")
    mp_idf_b = _idf(f"(SELECT df FROM dfreq WHERE term = '{HOT2}')")
    mp_idf_c = _idf(f"(SELECT df FROM dfreq WHERE term = '{MID2}')")
    w_mp = _R(_D(mp_idf_a) + " + " + _D(mp_idf_b) + " + " + _D(mp_idf_c))
    mp_t32 = _R(f"mp.ptf / (mp.ptf + {_D(_CACHE)})")
    mp_score = _R(w_mp + " * " + mp_t32)
    mp_body = (
        f"SELECT mp.doc_id AS doc_id, {mp_score} AS score "
        "FROM mp JOIN dlq ON mp.doc_id = dlq.doc_id WHERE mp.ptf > 0"
    )
    o["ft_multiphrase"] = _with([mp_cte], _topk_sql(mp_body))

    # relatedness(): z through five scaled sigmoids, floor(x*1e5+0.5) fixed
    # point (Math.round = floor(x+0.5)); arithmetic order mirrors the Spark
    # plan exactly (both are IEEE float64 → bitwise-identical)
    _sqrtarg = "fg_size * bg_prob * (1 - bg_prob)"
    _denom = f"(CASE WHEN sqrt({_sqrtarg}) = 0 THEN 1e-10 ELSE sqrt({_sqrtarg}) END)"
    _relsum = " + ".join(
        f"0.2 * ((zv + {off}) / ({scale} + abs(zv + {off})))"
        for off, scale in ((-80, 50), (-30, 30), (0, 30), (30, 30), (80, 50))
    )
    o["agg_relatedness"] = _with(
        [
            f"fg AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}')",
            "sizes AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS bg_size, "
            "(SELECT CAST(count(*) AS DOUBLE) FROM fg) AS fg_size)",
            "per AS (SELECT d.lang AS lang, CAST(count(*) AS DOUBLE) AS bg_count, "
            "CAST(sum(CASE WHEN fg.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS fg_count "
            "FROM documents d LEFT JOIN fg ON d.doc_id = fg.doc_id GROUP BY d.lang)",
            "calc AS (SELECT lang, fg_count, bg_count, bg_size, fg_size, bg_count / bg_size AS bg_prob "
            "FROM per, sizes)",
            f"zt AS (SELECT *, (fg_count - fg_size * bg_prob) / {_denom} AS zv FROM calc)",
        ],
        "SELECT lang, CAST(fg_count AS BIGINT) AS fg_count, CAST(bg_count AS BIGINT) AS bg_count, "
        "CAST(floor(fg_count / bg_size * 1e5 + 0.5) AS BIGINT) AS fg_pop_q, "
        "CAST(floor(bg_count / bg_size * 1e5 + 0.5) AS BIGINT) AS bg_pop_q, "
        f"CAST(floor(({_relsum}) * 1e5 + 0.5) AS BIGINT) AS rel_q "
        "FROM zt ORDER BY lang",
    )

    # sampled facet: 1-in-4 multiplicative-hash subsample of the match set
    o["agg_facet_sampled"] = _with(
        [
            f"m AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}')",
            "samp AS (SELECT doc_id FROM m WHERE (((doc_id % 100000007) * 2654435761) % 100000007) % 4 = 0)",
        ],
        "SELECT d.lang AS lang, CAST(count(*) AS BIGINT) AS sampled_cnt, "
        "CAST(count(*) * 4 AS BIGINT) AS est_cnt "
        "FROM samp JOIN documents d USING (doc_id) GROUP BY d.lang ORDER BY lang",
    )

    # taxonomy rollup: per-node counts of the lang -> source hierarchy
    o["agg_taxonomy_rollup"] = (
        "SELECT coalesce(lang, '<ALL>') AS lang, coalesce(source, '<ALL>') AS source, "
        "CAST(count(*) AS BIGINT) AS cnt FROM documents "
        "GROUP BY ROLLUP(lang, source) ORDER BY lang, source"
    )

    # JSON Facet nested terms facets: top-3 langs by sum(n_chars), top-2
    # sources per lang by count; ties break by bucket value asc (index order)
    o["agg_json_facet"] = (
        "WITH l AS (SELECT lang, CAST(count(*) AS BIGINT) AS lang_count, "
        "CAST(sum(n_chars) AS BIGINT) AS lang_chars_sum FROM documents GROUP BY lang "
        "ORDER BY lang_chars_sum DESC, lang ASC LIMIT 3), "
        "g2 AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS src_count, "
        "CAST(avg(n_chars) AS DOUBLE) AS src_chars_avg FROM documents "
        "WHERE lang IN (SELECT lang FROM l) GROUP BY lang, source), "
        "r2 AS (SELECT *, row_number() OVER (PARTITION BY lang "
        "ORDER BY src_count DESC, source ASC) AS rn FROM g2) "
        "SELECT l.lang AS lang, r2.source AS source, l.lang_count AS lang_count, "
        "l.lang_chars_sum AS lang_chars_sum, r2.src_count AS src_count, "
        "r2.src_chars_avg AS src_chars_avg "
        "FROM r2 JOIN l USING (lang) WHERE r2.rn <= 2 ORDER BY lang, source"
    )

    # naive Bayes classification: fixed-point (2^-20) integer scores — the
    # per-word float32 log-contribution quantizes to a BIGINT, so the sum is
    # order-free and bitwise-identical across engines
    def _q20(x: str) -> str:
        return f"CAST(floor(CAST(CAST({x} AS REAL) AS DOUBLE) * 1048576) AS BIGINT)"

    _nb_ctes = [
            "cstats AS (SELECT lang AS cls, CAST(count(*) AS DOUBLE) AS df_c FROM documents GROUP BY lang)",
            "gl AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM tf) / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avg_unique, "
            "(SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_labeled)",
            "cc AS (SELECT cls, avg_unique * df_c + n_labeled AS den, "
            + _q20("ln(df_c) - ln(n_labeled)")
            + " AS prior_q, "
            + _q20("ln(1.0/(avg_unique * df_c + n_labeled))")
            + " AS zero_q FROM cstats, gl)",
            "wc AS (SELECT t.term AS term, d.lang AS cls, count(*) AS hits "
            "FROM tf t JOIN documents d USING (doc_id) GROUP BY t.term, d.lang)",
            "dense AS (SELECT dl.doc_id, cc.cls, cc.prior_q + dl.dl * cc.zero_q AS base_q FROM dl, cc)",
            "sparse AS (SELECT tf.doc_id, wc.cls, sum(tf.tf * ("
            + _q20("ln((wc.hits + 1) / cc.den)")
            + " - cc.zero_q)) AS corr_q FROM tf JOIN wc USING (term) "
            "JOIN cc ON wc.cls = cc.cls GROUP BY tf.doc_id, wc.cls)",
            "nbsc AS (SELECT dense.doc_id AS doc_id, dense.cls AS cls, "
            "dense.base_q + coalesce(sparse.corr_q, 0) AS score FROM dense "
            "LEFT JOIN sparse ON dense.doc_id = sparse.doc_id AND dense.cls = sparse.cls)",
    ]
    _nb_best = (
        "nbbest AS (SELECT doc_id, cls, score FROM "
        "(SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn FROM nbsc) "
        "WHERE rn = 1)"
    )
    o["cls_naive_bayes"] = _with(
        _nb_ctes + [_nb_best],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, cls, CAST(score AS BIGINT) AS score "
        "FROM nbbest ORDER BY doc_id",
    )

    # confusion matrix: the same NB argmax joined back to the actual label
    o["cls_confusion"] = _with(
        _nb_ctes + [_nb_best],
        "SELECT d.lang AS actual, b.cls AS assigned, CAST(count(*) AS BIGINT) AS n "
        "FROM nbbest b JOIN documents d USING (doc_id) "
        "GROUP BY d.lang, b.cls ORDER BY actual, assigned",
    )

    # dataset splitter: the multiplicative-hash ppm bands replayed verbatim
    o["cls_split"] = """
WITH b AS (SELECT lang, (((doc_id % 100000007) * 2654435761) % 100000007) % 1000000 AS band FROM documents),
s AS (SELECT lang, CASE WHEN band < 200000 THEN 'test' WHEN band < 300000 THEN 'cv' ELSE 'train' END AS split FROM b)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY split, lang ORDER BY split, lang
"""

    # kNN classifier: per target, the ft_mlt scoring replay -> top-10 ->
    # 2^-20 fixed-point normalized-score vote -> argmax (ties: higher class,
    # matching classify_doc's (vote, cls) max)
    _knn_ctes, _knn_parts = [], []
    for _t in KNN_TARGETS:
        _knn_ctes += [
            f"kmlt{_t} AS (SELECT term FROM tf WHERE doc_id = {_t} ORDER BY tf DESC, term ASC LIMIT 5)",
            f"ksc{_t} AS (SELECT tf.doc_id AS doc_id, "
            f"CAST(sum(CAST({per_term_score} AS DOUBLE)) AS REAL) AS score "
            f"FROM tf JOIN kmlt{_t} USING (term) JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.doc_id <> {_t} GROUP BY tf.doc_id)",
            f"ktop{_t} AS (SELECT doc_id, score FROM ksc{_t} ORDER BY score DESC, doc_id ASC LIMIT 10)",
            f"kvote{_t} AS (SELECT d.lang AS cls, sum(CAST(floor("
            f"CAST(t.score AS DOUBLE) / (SELECT CAST(max(score) AS DOUBLE) FROM ktop{_t}) * 1048576"
            f") AS BIGINT)) AS vote FROM ktop{_t} t JOIN documents d USING (doc_id) GROUP BY d.lang)",
            f"kbest{_t} AS (SELECT {_t} AS target_id, cls, vote FROM kvote{_t} "
            f"ORDER BY vote DESC, cls DESC LIMIT 1)",
        ]
        _knn_parts.append(f"SELECT * FROM kbest{_t}")
    # BooleanPerceptronClassifier, batch_size=1: the FST snapshot refreshes
    # after every misclassified doc, so snapshot == live weights throughout
    # and the training loop is a pure sequential state machine over the
    # corpus's fixed vocabulary — replayed here as a recursive CTE: state =
    # the vocab-ordered integer weight list, one recursion step per doc in
    # doc_id order (assign vs bias, modifier in {-1,0,1}, per-term overwrite
    # max(0, w + m*tf)); classify() is the final-weight dot product.  All
    # integer arithmetic; bias is the one double (sum_ttf/doc_count), exact.
    o["cls_perceptron"] = """
WITH RECURSIVE
tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS ttf FROM tok GROUP BY term),
vlist AS (SELECT list(ttf ORDER BY term) AS w0, list(term ORDER BY term) AS vt FROM vocab),
nstat AS (SELECT CAST((SELECT sum(ttf) FROM vocab) AS DOUBLE) / (SELECT count(*) FROM documents) AS bias),
dgrid AS (SELECT d.doc_id, v.term FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN vocab v),
dtf AS (SELECT g.doc_id, g.term, coalesce(t.c, 0) AS tf
        FROM dgrid g LEFT JOIN (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
                                FROM tok GROUP BY doc_id, term) t
        ON g.doc_id = t.doc_id AND g.term = t.term),
dvec AS (SELECT d.doc_id, list(tf ORDER BY term) AS tfv,
                row_number() OVER (ORDER BY d.doc_id) AS idx,
                any_value(lbl) AS correct
         FROM dtf d JOIN (SELECT doc_id, lang = 'en' AS lbl FROM documents) l ON d.doc_id = l.doc_id
         GROUP BY d.doc_id),
ndocs AS (SELECT count(*) AS n FROM dvec),
train(step, w) AS (
  SELECT 0, (SELECT w0 FROM vlist)
  UNION ALL
  SELECT step, CASE WHEN modifier = 0 THEN w
               ELSE list_transform(range(1, len(w) + 1),
                      i -> CASE WHEN tfv[CAST(i AS INT)] > 0
                                THEN greatest(0, w[CAST(i AS INT)] + modifier * tfv[CAST(i AS INT)])
                                ELSE w[CAST(i AS INT)] END)
               END
  FROM (
    SELECT step, w, tfv,
           CASE WHEN correct AND NOT assigned THEN 1
                WHEN (NOT correct) AND assigned THEN -1 ELSE 0 END AS modifier
    FROM (
      SELECT t.step + 1 AS step, t.w, d.tfv, d.correct,
             CAST(list_sum(list_transform(range(1, len(t.w) + 1),
                    i -> t.w[CAST(i AS INT)] * d.tfv[CAST(i AS INT)])) AS DOUBLE)
               >= (SELECT bias FROM nstat) AS assigned
      FROM train t JOIN dvec d ON d.idx = t.step + 1
      WHERE t.step < (SELECT n FROM ndocs)
    )
  )
),
wfinal AS (SELECT w FROM train ORDER BY step DESC LIMIT 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(list_sum(list_transform(range(1, len(f.w) + 1),
              i -> f.w[CAST(i AS INT)] * d.tfv[CAST(i AS INT)])) AS BIGINT) AS output,
       CAST(list_sum(list_transform(range(1, len(f.w) + 1),
              i -> f.w[CAST(i AS INT)] * d.tfv[CAST(i AS INT)])) AS DOUBLE)
         >= (SELECT bias FROM nstat) AS assigned
FROM dvec d CROSS JOIN wfinal f ORDER BY doc_id
"""

    o["cls_knn"] = _with(
        _knn_ctes,
        "SELECT CAST(target_id AS BIGINT) AS target_id, cls, CAST(vote AS BIGINT) AS vote FROM ("
        + " UNION ALL ".join(_knn_parts)
        + ") ORDER BY target_id",
    )

    # fuzzy-kNN classifier: full NearestFuzzyQuery.rewrite replay — per
    # token: 2-prefix + suffix-levenshtein<=1 expansion, FuzzyTermsEnum f32
    # boost, variant score f32(f32(b^2)*classic_idf(df_src | avg-variant-df)),
    # global top-300; leaves score BM25 with df FORCED to 1 (newTermQuery);
    # then the same quantized top-10 vote as cls_knn
    import re as _re

    _nf_ctes, _nf_parts = [], []
    for _j, _text in enumerate(KNN_FUZZY_TEXTS):
        _tok_parts = []
        for _i, _t in enumerate(_re.findall("[a-z0-9]+", _text.lower())):
            # effective prefix min(2, |token|), as FuzzyTermsEnum realPrefixLength
            _pl = min(2, len(_t))
            _pre, _suf, _n = _t[:_pl], _t[_pl:], len(_t)
            _b = (
                f"CASE WHEN term = '{_t}' THEN CAST(1.0 AS REAL) ELSE "
                + _R(f"1.0 - {_R(f'CAST(1 AS REAL) / CAST(least(length(term), {_n}) AS REAL)')}")
                + " END"
            )
            _nf_ctes += [
                f"nfc{_j}_{_i} AS (SELECT term, df, {_b} AS b FROM dfreq "
                f"WHERE substring(term, 1, {_pl}) = '{_pre}' "
                f"AND levenshtein(substring(term, {_pl + 1}), '{_suf}') <= 1)",
                # df_src > 0 wins; else integer mean of ALL variant dfs (:185-193)
                f"nfd{_j}_{_i} AS (SELECT CASE WHEN max(CASE WHEN term = '{_t}' THEN df END) > 0 "
                f"THEN max(CASE WHEN term = '{_t}' THEN df END) "
                f"ELSE CAST(floor(sum(df) * 1.0 / count(*)) AS BIGINT) END AS dfu FROM nfc{_j}_{_i})",
                f"nfs{_j}_{_i} AS (SELECT term, "
                + _R(
                    _R("b * b")
                    + " * "
                    + _R(f"ln(((SELECT n FROM st) + 1) / ((SELECT dfu FROM nfd{_j}_{_i}) + 1.0)) + 1.0")
                )
                + f" AS st FROM (SELECT term, b FROM nfc{_j}_{_i} ORDER BY b DESC, term ASC LIMIT 50))",
            ]
            _tok_parts.append(f"SELECT term, st FROM nfs{_j}_{_i}")
        _nf_w = _R(f"lv.st * {_idf('1')}")
        _nf_leaf = _R(f"{_nf_w} * {_R(f'tf.tf / (tf.tf + {_D(_CACHE)})')}")
        _nf_ctes += [
            f"nfl{_j} AS (SELECT term, st FROM (" + " UNION ALL ".join(_tok_parts) + ") "
            f"ORDER BY st DESC, term ASC LIMIT 300)",
            f"nsc{_j} AS (SELECT tf.doc_id AS doc_id, "
            f"CAST(sum(CAST({_nf_leaf} AS DOUBLE)) AS REAL) AS score "
            f"FROM tf JOIN nfl{_j} lv USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"GROUP BY tf.doc_id)",
            f"ntop{_j} AS (SELECT doc_id, score FROM nsc{_j} ORDER BY score DESC, doc_id ASC LIMIT 10)",
            f"nvote{_j} AS (SELECT d.lang AS cls, sum(CAST(floor("
            f"CAST(t.score AS DOUBLE) / (SELECT CAST(max(score) AS DOUBLE) FROM ntop{_j}) * 1048576"
            f") AS BIGINT)) AS vote FROM ntop{_j} t JOIN documents d USING (doc_id) GROUP BY d.lang)",
            f"nbest{_j} AS (SELECT {_j} AS query_id, cls, vote FROM nvote{_j} "
            f"ORDER BY vote DESC, cls DESC LIMIT 1)",
        ]
        _nf_parts.append(f"SELECT * FROM nbest{_j}")
    o["cls_knn_fuzzy"] = _with(
        _nf_ctes,
        "SELECT CAST(query_id AS BIGINT) AS query_id, cls, CAST(vote AS BIGINT) AS vote FROM ("
        + " UNION ALL ".join(_nf_parts)
        + ") ORDER BY query_id",
    )

    # FuzzyLikeThisQuery (ignoreTF): NearestFuzzy variant selection at
    # maxEdits=2, then constant-score presence sum of the f32 st boosts
    _flt_ctes, _flt_parts = [], []
    for _i, _t in enumerate(_re.findall("[a-z0-9]+", FLT_TEXT.lower())):
        _pl = min(2, len(_t))
        _pre, _suf, _n = _t[:_pl], _t[_pl:], len(_t)
        _lev = f"levenshtein(substring(term, {_pl + 1}), '{_suf}')"
        _div = _R(f"CAST({_lev} AS REAL) / CAST(least(length(term), {_n}) AS REAL)")
        _b = (
            f"CASE WHEN term = '{_t}' THEN CAST(1.0 AS REAL) ELSE "
            + _R(f"1.0 - {_div}")
            + " END"
        )
        _flt_ctes += [
            f"flc{_i} AS (SELECT term, df, {_b} AS b FROM dfreq "
            f"WHERE substring(term, 1, {_pl}) = '{_pre}' AND {_lev} <= 2)",
            f"fld{_i} AS (SELECT CASE WHEN max(CASE WHEN term = '{_t}' THEN df END) > 0 "
            f"THEN max(CASE WHEN term = '{_t}' THEN df END) "
            f"ELSE CAST(floor(sum(df) * 1.0 / count(*)) AS BIGINT) END AS dfu FROM flc{_i})",
            f"fls{_i} AS (SELECT term, "
            + _R(
                _R("b * b")
                + " * "
                + _R(f"ln(((SELECT n FROM st) + 1) / ((SELECT dfu FROM fld{_i}) + 1.0)) + 1.0")
            )
            + f" AS stv FROM (SELECT term, b FROM flc{_i} ORDER BY b DESC, term ASC LIMIT 50))",
        ]
        _flt_parts.append(f"SELECT term, stv FROM fls{_i}")
    _flt_ctes += [
        "fll AS (SELECT term, stv FROM (" + " UNION ALL ".join(_flt_parts) + ") "
        "ORDER BY stv DESC, term ASC LIMIT 300)",
        "flsc AS (SELECT tf.doc_id AS doc_id, "
        "CAST(sum(CAST(lv.stv AS DOUBLE)) AS REAL) AS score "
        "FROM tf JOIN fll lv USING (term) GROUP BY tf.doc_id)",
    ]
    o["ft_flt"] = _with(_flt_ctes, _topk_sql("SELECT doc_id, score FROM flsc"))

    # BM25-NB classifier: class-field leaf is a per-class constant
    # (dl = avgdl = tf = 1 -> cache 1.2f); termProb(c, w) = f32(cl_c +
    # max class-doc word leaf); posterior = q20(ln(cl)) + sum tf*q20(ln(tp))
    _bm_t1 = _R("1.0 / (1.0 + CAST(CAST(1.2 AS REAL) AS DOUBLE))")
    _bm_targets = ", ".join(str(t) for t in KNN_TARGETS[:3])
    _bm_leaf = _R(f"{_idf('dfreq.df')} * " + _R(f"tf.tf / (tf.tf + {_D(_CACHE)})"))
    o["cls_bm25nb"] = _with(
        [
            "ccl AS (SELECT cls, "
            + _R(f"{_idf('df_c')} * {_bm_t1}")
            + " AS cl FROM (SELECT lang AS cls, count(*) AS df_c FROM documents GROUP BY lang))",
            f"btw AS (SELECT doc_id, term, tf FROM tf WHERE doc_id IN ({_bm_targets}))",
            "bwords AS (SELECT DISTINCT term FROM btw)",
            f"bwm AS (SELECT d.lang AS cls, tf.term AS term, max({_bm_leaf}) AS mx "
            "FROM tf JOIN bwords USING (term) JOIN dfreq USING (term) "
            "JOIN dlq ON tf.doc_id = dlq.doc_id JOIN documents d ON tf.doc_id = d.doc_id "
            "GROUP BY d.lang, tf.term)",
            "bgrid AS (SELECT ccl.cls AS cls, bwords.term AS term, "
            + _R("ccl.cl + coalesce(bwm.mx, CAST(0.0 AS REAL))")
            + " AS tp FROM ccl CROSS JOIN bwords "
            "LEFT JOIN bwm ON bwm.cls = ccl.cls AND bwm.term = bwords.term)",
            f"bsc AS (SELECT t.doc_id AS doc_id, g.cls AS cls, "
            f"sum(t.tf * {_q20('ln(g.tp)')}) AS ll_q "
            "FROM btw t JOIN bgrid g ON t.term = g.term GROUP BY t.doc_id, g.cls)",
            # present targets with no tokens keep the reference's prior-only
            # row (empty token stream -> log-likelihood 0)
            f"btgt AS (SELECT doc_id FROM documents WHERE doc_id IN ({_bm_targets}))",
            f"bprior AS (SELECT cls, {_q20('ln(cl)')} AS prior_q FROM ccl)",
            "btot AS (SELECT t.doc_id AS doc_id, p.cls AS cls, "
            "p.prior_q + coalesce(b.ll_q, 0) AS score FROM btgt t CROSS JOIN bprior p "
            "LEFT JOIN bsc b ON b.doc_id = t.doc_id AND b.cls = p.cls)",
        ],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, cls, CAST(score AS BIGINT) AS score_q FROM "
        "(SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn FROM btot) "
        "WHERE rn = 1 ORDER BY doc_id",
    )

    # interval queries: minimal-interval candidates + strict-containment
    # filter; per-interval float32 contribution 1/max(e-s,1) quantized to a
    # 2^-20 BIGINT so per-doc sums are order-free exact
    _itv_contrib = (
        "CAST(floor(CAST(CAST(1.0 AS REAL)/CAST(greatest(e - s, 1) AS REAL) AS DOUBLE) * 1048576) AS BIGINT)"
    )
    _itv_rank = (
        "SELECT CAST(row_number() OVER (ORDER BY freq_q DESC, doc_id ASC) AS INT) AS rank, "
        "CAST(doc_id AS BIGINT) AS doc_id, CAST(freq_q AS BIGINT) AS freq_q FROM fqt "
        "ORDER BY freq_q DESC, doc_id ASC LIMIT 20"
    )
    o["itv_ordered"] = _with(
        [tokp,
         # ordered(t1, t2): for each t2 occurrence e, s = the latest t1 before it
         f"cand AS (SELECT b.doc_id AS doc_id, (SELECT max(a.pos) FROM tokp a WHERE a.doc_id = b.doc_id "
         f"AND a.term = '{HOT}' AND a.pos < b.pos) AS s, b.pos AS e FROM tokp b WHERE b.term = '{HOT2}')",
         "mini AS (SELECT DISTINCT doc_id, s, e FROM cand c WHERE s IS NOT NULL AND NOT EXISTS ("
         "SELECT 1 FROM cand c2 WHERE c2.doc_id = c.doc_id AND c2.s IS NOT NULL "
         "AND c2.s >= c.s AND c2.e <= c.e AND (c2.s <> c.s OR c2.e <> c.e)))",
         f"fqt AS (SELECT doc_id, sum({_itv_contrib}) AS freq_q FROM mini "
         "WHERE e - s - 1 <= 3 GROUP BY doc_id)"],
        _itv_rank,
    )
    # nested: ordered(or(HOT2, MID), HOT) — the or() of width-1 terms is the
    # union of their positions; the rest is the itv_ordered minimization
    o["itv_nested_or"] = _with(
        [tokp,
         f"cand AS (SELECT b.doc_id AS doc_id, (SELECT max(a.pos) FROM tokp a WHERE a.doc_id = b.doc_id "
         f"AND a.term IN ('{HOT2}', '{MID}') AND a.pos < b.pos) AS s, b.pos AS e FROM tokp b WHERE b.term = '{HOT}')",
         "mini AS (SELECT DISTINCT doc_id, s, e FROM cand c WHERE s IS NOT NULL AND NOT EXISTS ("
         "SELECT 1 FROM cand c2 WHERE c2.doc_id = c.doc_id AND c2.s IS NOT NULL "
         "AND c2.s >= c.s AND c2.e <= c.e AND (c2.s <> c.s OR c2.e <> c.e)))",
         f"fqt AS (SELECT doc_id, sum({_itv_contrib}) AS freq_q FROM mini "
         "WHERE e - s - 1 <= 3 GROUP BY doc_id)"],
        _itv_rank,
    )

    o["itv_unordered"] = _with(
        [tokp,
         # unordered(t1, t2): every occurrence pair spans a candidate window
         f"cand AS (SELECT a.doc_id AS doc_id, least(a.pos, b.pos) AS s, greatest(a.pos, b.pos) AS e "
         f"FROM tokp a JOIN tokp b USING (doc_id) WHERE a.term = '{MID}' AND b.term = '{HOT}')",
         "mini AS (SELECT DISTINCT doc_id, s, e FROM cand c WHERE NOT EXISTS ("
         "SELECT 1 FROM cand c2 WHERE c2.doc_id = c.doc_id "
         "AND c2.s >= c.s AND c2.e <= c.e AND (c2.s <> c.s OR c2.e <> c.e)))",
         f"fqt AS (SELECT doc_id, sum({_itv_contrib}) AS freq_q FROM mini "
         "WHERE e - s - 1 <= 2 GROUP BY doc_id)"],
        _itv_rank,
    )

    # information-gain feature selection (IGainTermsQParserPlugin formula)
    def _H(p: str) -> str:
        return (
            f"CASE WHEN ({p}) <= 0 OR ({p}) >= 1 THEN 0.0 "
            f"ELSE -({p})*ln({p}) - (1.0-({p}))*ln(1.0-({p})) END"
        )

    o["tl_igain"] = _with(
        [
            "lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents)",
            "gs AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(y) AS DOUBLE) AS np FROM lab)",
            "tc AS (SELECT tf.term AS term, CAST(sum(lab.y) AS DOUBLE) AS xc, CAST(count(*) AS DOUBLE) AS df "
            "FROM tf JOIN lab USING (doc_id) GROUP BY tf.term)",
            "sc AS (SELECT term, " + _H("np/n") + " - ((df/n)*(" + _H("xc/df") + ") + (1.0 - df/n)*("
            + _H("(np - xc)/(n - df + 1)")
            + ")) AS score, df FROM tc, gs)",
        ],
        "SELECT term, CAST(floor(CAST(CAST(score AS REAL) AS DOUBLE) * 1048576) AS BIGINT) AS score_q, "
        "CAST(df AS BIGINT) AS doc_freq FROM sc ORDER BY score DESC, term ASC LIMIT 20",
    )

    # spatial: quantize to the reference's 32-bit grid (exact double ops),
    # haversine on the mean earth radius; formula shape mirrors geo.py
    # term-for-term so both engines perform the same IEEE operations
    _geo_pts = (
        "pts AS (SELECT c_custkey, (c_custkey * 7919 % 18000)/100.0 - 90.0 AS lat, "
        "(c_custkey * 104729 % 36000)/100.0 - 180.0 AS lon FROM customer)"
    )
    _geo_q = (
        "q AS (SELECT c_custkey, floor(lat / (180.0/4294967296.0)) * (180.0/4294967296.0) AS qlat, "
        "floor(lon / (360.0/4294967296.0)) * (360.0/4294967296.0) AS qlon FROM pts)"
    )
    _hav = (
        "2 * 6371008.7714 * asin(least(1.0, sqrt("
        "sin(radians(37.77 - qlat)/2) * sin(radians(37.77 - qlat)/2) + "
        "cos(radians(qlat)) * cos(radians(37.77)) * sin(radians(-122.42 - qlon)/2) * sin(radians(-122.42 - qlon)/2)"
        ")))"
    )
    o["geo_distance"] = (
        f"WITH {_geo_pts}, {_geo_q} "
        f"SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(floor({_hav}) AS BIGINT) AS dist_m "
        f"FROM q WHERE {_hav} <= 3000000.0 ORDER BY c_custkey"
    )
    o["geo_box"] = (
        f"WITH {_geo_pts}, {_geo_q} "
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM q "
        "WHERE qlat >= -10.0 AND qlat <= 35.5 AND qlon >= 20.25 AND qlon <= 140.0 "
        "ORDER BY c_custkey"
    )

    # polygon: the identical unrolled pnpoly program, generated from the
    # same vertex constants (geo.polygon_predicate_sql)
    from lucene_solr_spark.functions.geo import polygon_predicate_sql

    o["geo_polygon"] = (
        f"WITH {_geo_pts}, {_geo_q} "
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM q "
        f"WHERE {polygon_predicate_sql('qlat', 'qlon', POLY_LATS, POLY_LONS, holes=[POLY_HOLE])} "
        "ORDER BY c_custkey"
    )

    # distance feature: double haversine → float32 score, same term order
    _hav_paris = (
        "2 * 6371008.7714 * asin(least(1.0, sqrt("
        "sin(radians(48.85 - qlat)/2) * sin(radians(48.85 - qlat)/2) + "
        "cos(radians(qlat)) * cos(radians(48.85)) * sin(radians(2.35 - qlon)/2) * sin(radians(2.35 - qlon)/2)"
        ")))"
    )
    o["geo_distance_feature"] = (
        f"WITH {_geo_pts}, {_geo_q} "
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, "
        f"CAST(2.0 * (2000000.0 / (2000000.0 + {_hav_paris})) AS FLOAT) AS score "
        "FROM q ORDER BY score DESC, c_custkey ASC LIMIT 20"
    )

    # shape indexing: closed-form weighted-L1 geometry over the diamond
    # parameters — independent of the tessellation the Spark path verifies.
    # Margins are >= ~1e-3 deg by the radius-grid construction, so the raw
    # double truth here equals the encoded-int mesh decision.
    _dia = (
        "dia AS (SELECT c_custkey, "
        "(c_custkey * 7919 % 16000)/100.0 - 80.0 AS clat, "
        "(c_custkey * 104729 % 34000)/100.0 - 170.0 AS clon, "
        "(c_custkey % 5 + 1) * 0.31 + 0.0043 AS r FROM customer)"
    )
    _box_l1 = (
        "greatest(-10.005 - clat, clat - 25.005, 0.0) + "
        "greatest(30.005 - clon, clon - 90.005, 0.0)/2.0"
    )
    o["geo_shape_box"] = (
        f"WITH {_dia} SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM dia "
        f"WHERE {_box_l1} <= r ORDER BY c_custkey"
    )
    o["geo_shape_within"] = (
        f"WITH {_dia} SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM dia "
        "WHERE clat - r >= -10.005 AND clat + r <= 25.005 "
        "AND clon - 2*r >= 30.005 AND clon + 2*r <= 90.005 ORDER BY c_custkey"
    )
    o["geo_shape_disjoint"] = (
        f"WITH {_dia} SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM dia "
        f"WHERE NOT ({_box_l1} <= r) ORDER BY c_custkey"
    )
    o["geo_shape_polygon"] = (
        f"WITH {_dia} SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM dia "
        "WHERE abs(clat - 5.1234) + abs(clon - (-40.5678))/2.0 <= r + 20.0 "
        "ORDER BY c_custkey"
    )
    o["geo_shape_line"] = (
        f"WITH {_dia} SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM dia "
        "WHERE clon >= 30.005 AND clon <= 90.005 AND clat <= 25.005 AND clat + r >= -10.005 "
        "ORDER BY c_custkey"
    )
    o["geo_shape_linequery"] = (
        f"WITH {_dia} SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM dia "
        "WHERE abs(clat - 2.07) + greatest(-60.0 - clon, clon - (-20.0), 0.0)/2.0 <= r "
        "OR greatest(2.07 - clat, clat - 30.03, 0.0) + abs(clon - (-20.0))/2.0 <= r "
        "ORDER BY c_custkey"
    )

    # query-time join, ScoreMode.Max (max over float32 is order-free ⇒ exact)
    o["ft_joinutil"] = _with(
        [
            _term_cte("sa", RARE),
            "jv AS (SELECT d.source AS jv, max(sa.score) AS score "
            "FROM sa JOIN documents d ON sa.doc_id = d.doc_id GROUP BY d.source)",
        ],
        _topk_sql(
            "SELECT d.doc_id AS doc_id, jv.score AS score "
            "FROM documents d JOIN jv ON d.source = jv.jv"
        ),
    )

    # FILTER occur: MID scored, HOT required but non-scoring
    o["ft_filter_clause"] = _with(
        [_term_cte("sa", MID)],
        _topk_sql(
            "SELECT doc_id, score FROM sa WHERE doc_id IN "
            f"(SELECT doc_id FROM tf WHERE term = '{HOT}')"
        ),
    )

    # boosted SHOULD clause: leaf weight = f32(f32(2.0) * idf) (BM25Similarity.java:219)
    boosted_w = _R("CAST(2.0 AS REAL) * " + _idf("dfreq.df"))
    b_t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    b_score = _R(f"{boosted_w} * {b_t32}")
    boosted_cte = (
        f"sa AS (SELECT tf.doc_id AS doc_id, {b_score} AS score "
        f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
        f"WHERE tf.term = '{MID}')"
    )
    boost_body = (
        f"SELECT doc_id, {_R('sum(' + _D('score') + ')')} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) GROUP BY doc_id"
    )
    o["ft_boost"] = _with([boosted_cte, _term_cte("sb", RARE)], _topk_sql(boost_body))

    o["ft_spellcheck"] = _with(
        [],
        "SELECT term, CAST(levenshtein(term, 'scann') AS INT) AS distance, CAST(df AS BIGINT) AS df "
        "FROM dfreq WHERE levenshtein(term, 'scann') <= 2 AND term <> 'scann' "
        "ORDER BY distance ASC, df DESC, term ASC LIMIT 5",
    )

    o["agg_drill_sideways"] = _with(
        [f"hot AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}')"],
        "SELECT dim, value, cnt FROM ("
        "  SELECT 'lang' AS dim, d.lang AS value, CAST(count(*) AS BIGINT) AS cnt FROM documents d "
        "  WHERE d.doc_id IN (SELECT doc_id FROM hot) AND d.source = 'src3' GROUP BY d.lang"
        "  UNION ALL "
        "  SELECT 'source' AS dim, d.source AS value, CAST(count(*) AS BIGINT) AS cnt FROM documents d "
        "  WHERE d.doc_id IN (SELECT doc_id FROM hot) AND d.lang = 'en' GROUP BY d.source"
        ") ORDER BY dim, value",
    )

    o["agg_collapse_expand"] = _with(
        [
            _term_cte("sc", HOT),
            "r AS (SELECT d.source AS grp, sc.doc_id AS doc_id, "
            "row_number() OVER (PARTITION BY d.source ORDER BY sc.score DESC, sc.doc_id ASC) AS rn "
            "FROM sc JOIN documents d ON sc.doc_id = d.doc_id)",
        ],
        "SELECT grp, CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS head_doc, "
        "coalesce(string_agg(CASE WHEN rn > 1 THEN CAST(doc_id AS VARCHAR) END, ',' ORDER BY doc_id), '') AS exp_docs "
        "FROM r WHERE rn <= 3 GROUP BY grp ORDER BY grp",
    )

    o["ft_blockjoin"] = _with(
        [_term_cte("sc", RARE)],
        "SELECT parent, CAST(count(*) AS BIGINT) AS n_hits, "
        "CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS best_doc FROM ("
        "  SELECT d.source AS parent, sc.doc_id AS doc_id, "
        "  row_number() OVER (PARTITION BY d.source ORDER BY sc.score DESC, sc.doc_id ASC) AS rn"
        "  FROM sc JOIN documents d ON sc.doc_id = d.doc_id"
        ") GROUP BY parent ORDER BY parent",
    )

    # function query: f32( f64(bm25) * ( 1000/(n_chars+1000) * (tf2+1) ) )
    fq_mul = "((1000 / (d.n_chars * 1 + 1000)) * (coalesce(x.mtf, 0) + 1))"
    fq_score = _R(f"{_D('sc.score')} * {fq_mul}")
    o["ft_funcq"] = _with(
        [
            _term_cte("sc", HOT),
            f"fqt AS (SELECT doc_id, tf AS mtf FROM tf WHERE term = '{HOT2}')",
        ],
        _topk_sql(
            f"SELECT sc.doc_id AS doc_id, {fq_score} AS score FROM sc "
            "JOIN documents d ON sc.doc_id = d.doc_id "
            "LEFT JOIN fqt x ON sc.doc_id = x.doc_id"
        ),
    )

    # searchAfter page 2 = global ranks 11..20, rebased to 1..10
    o["ft_search_after"] = _with(
        [_term_cte("sc", HOT)],
        "SELECT CAST(rnk - 10 AS INT) AS rank, CAST(doc_id AS BIGINT) AS doc_id FROM ("
        "  SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk, doc_id FROM sc"
        ") WHERE rnk BETWEEN 11 AND 20 ORDER BY rnk",
    )

    # ft_explain: leaf-level BM25 decomposition for the flagship OR's top-10
    # page — weight = f32 idf, score = f32(weight * f32 tf-norm), both
    # emitted floor(f32_as_double * 2^20) (quantize-before-compare contract)
    _q20 = lambda x: f"CAST(floor({_D(x)} * 1048576) AS BIGINT)"  # noqa: E731
    _expl_t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    _expl_w = _R(_idf("dfreq.df"))
    o["ft_explain"] = _with(
        [_term_cte("sa", HOT), _term_cte("sb", MID)],
        f"""
SELECT CAST(tf.doc_id AS BIGINT) AS doc_id, tf.term AS term, CAST(tf.tf AS BIGINT) AS tf,
       CAST(dfreq.df AS BIGINT) AS df,
       {_q20(_expl_w)} AS weight_q,
       {_q20(_R(_expl_w + " * " + _expl_t32))} AS score_q
FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id
WHERE tf.term IN ('{HOT}', '{MID}') AND tf.doc_id IN (
  SELECT doc_id FROM (
    SELECT doc_id, {_R('sum(' + _D('score') + ')')} AS score
    FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) GROUP BY doc_id
  ) ORDER BY score DESC, doc_id ASC LIMIT 10)
ORDER BY doc_id, term
""",
    )

    # ft_cluster_topk: top-60 page -> poly31-hashed 32-bucket token vectors
    # -> the same deterministic k-means replay as sim_ann_ivf (hash-spread
    # init over the PAGE's doc ids, two integer Lloyd rounds, exact-L2
    # assignment with ties to the lowest centroid)
    _cl_l2 = lambda a, b: (  # noqa: E731
        f"list_sum(list_transform(range(1, 33), i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))"
    )
    _cl_lloyd = []
    for _r in (1, 2):
        _prev = f"kc{_r - 1}"
        _cl_lloyd.append(
            f"""
ks{_r} AS (SELECT v.doc_id, v.q, c.cent_id, {_cl_l2('v.q', 'c.cvec')} AS l2 FROM cvecs v CROSS JOIN {_prev} c),
ka{_r} AS (SELECT doc_id, q, cent_id FROM
           (SELECT doc_id, q, cent_id,
                   row_number() OVER (PARTITION BY doc_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM ks{_r})
           WHERE rn = 1),
km{_r} AS (SELECT cent_id, i, sum(q[i]) AS s, count(*) AS c
           FROM ka{_r} CROSS JOIN (SELECT unnest(range(1, 33)) AS i) GROUP BY cent_id, i),
kc{_r} AS (SELECT cent_id, list((s - ((s % c + c) % c)) // c ORDER BY i) AS cvec FROM km{_r} GROUP BY cent_id)"""
        )
    _poly31b = (
        "list_reduce(list_transform(range(1, length(term)+1), "
        "i -> CAST(unicode(substr(term, CAST(i AS INT), 1)) AS BIGINT)), "
        "(a, b) -> (a*31+b) % 1000000007) % 32"
    )
    o["ft_cluster_topk"] = _with(
        [
            _term_cte("sc", HOT),
            "sel AS (SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT 60)",
            f"feats AS (SELECT t.doc_id, {_poly31b} AS b FROM tok t JOIN sel USING (doc_id))",
            "fcnt AS (SELECT doc_id, b, count(*) AS c FROM feats GROUP BY doc_id, b)",
            "grid AS (SELECT s.doc_id, g.b FROM sel s CROSS JOIN (SELECT unnest(range(0, 32)) AS b) g)",
            "cvecs AS (SELECT doc_id, list(coalesce(c, 0) ORDER BY b) AS q\n"
            "          FROM grid LEFT JOIN fcnt USING (doc_id, b) GROUP BY doc_id)",
            "kranked0 AS (SELECT doc_id, q,\n"
            "             row_number() OVER (ORDER BY ((doc_id % 100000007) * 2654435761) % 100000007 ASC, doc_id ASC) - 1 AS cent_id\n"
            "             FROM cvecs)",
            "kc0 AS (SELECT CAST(cent_id AS INT) AS cent_id, q AS cvec FROM kranked0 WHERE cent_id < 4)",
            ",".join(_cl_lloyd).strip(),
            f"kf AS (SELECT v.doc_id, c.cent_id, {_cl_l2('v.q', 'c.cvec')} AS l2 FROM cvecs v CROSS JOIN kc2 c)",
            "kr AS (SELECT doc_id, cent_id,\n"
            "       row_number() OVER (PARTITION BY doc_id ORDER BY l2 ASC, cent_id ASC) AS rn FROM kf)",
        ],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(cent_id AS BIGINT) AS cluster\n"
        "FROM kr WHERE rn = 1 ORDER BY doc_id",
    )

    # keyword / point field filters: FILTER clauses are non-scoring, so the
    # score is the text clause's alone
    o["ft_field_filter"] = _with(
        [_term_cte("sc", HOT)],
        _topk_sql(
            "SELECT sc.doc_id AS doc_id, sc.score AS score FROM sc "
            "JOIN documents d ON sc.doc_id = d.doc_id WHERE d.lang = 'en'"
        ),
    )
    o["ft_point_range"] = _with(
        [_term_cte("sc", MID)],
        _topk_sql(
            "SELECT sc.doc_id AS doc_id, sc.score AS score FROM sc "
            "JOIN documents d ON sc.doc_id = d.doc_id WHERE d.n_chars BETWEEN 120 AND 300"
        ),
    )
    # parsed `lang:en AND scan`: both MUST; the field clause scores constant
    # f32(1.0), summed in double with the term clause, cast back f32
    pf_sum = _R(_D("1.0") + " + " + _D("sc.score"))
    o["ft_parsed_field"] = _with(
        [_term_cte("sc", HOT)],
        _topk_sql(
            f"SELECT sc.doc_id AS doc_id, {pf_sum} AS score FROM sc "
            "JOIN documents d ON sc.doc_id = d.doc_id WHERE d.lang = 'en'"
        ),
    )

    # XML CoreParser boolean: +merge -dup filter(n_chars in [120,300]) —
    # the filter clause is non-scoring, score = BM25(merge) alone
    o["ft_xml_parse"] = _with(
        [_term_cte("sc", HOT2), _term_cte("sd", RARE)],
        _topk_sql(
            "SELECT sc.doc_id AS doc_id, sc.score AS score FROM sc "
            "JOIN documents d ON sc.doc_id = d.doc_id "
            "WHERE d.n_chars BETWEEN 120 AND 300 "
            "AND sc.doc_id NOT IN (SELECT doc_id FROM sd)"
        ),
    )

    # ClassicSimilarity: f32(f32(f32(sqrt(tf)) * idf32) * f32(1/sqrt(dlq)))
    # with idf32 = f32(ln((N+1)/(df+1)) + 1)  (ClassicSimilarity.java:39-63,
    # TFIDFSimilarity.java:519-552)
    cl_idf = _R("ln(((SELECT n FROM st) + 1) / (dfreq.df + 1)) + 1.0")
    cl_raw = _R(f"{_R('sqrt(tf.tf)')} * {cl_idf}")
    cl_score = _R(f"{cl_raw} * {_R('1.0 / sqrt(dlq.dlq)')}")
    o["ft_classic_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, {cl_score} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # LMDirichletSimilarity μ=2000: double score = ln(1+tf/(μ·p_c)) +
    # ln(μ/(dl+μ)), p_c = (ttf+1)/(sttf+1), clamped at 0, f32 cast
    # (LMDirichletSimilarity.java:73-77, LMSimilarity.java:154-156)
    lm_pc = "((ttfq.ttf + 1.0) / ((SELECT sttf FROM st) + 1.0))"
    lm_raw = f"(ln(1.0 + tf.tf / (2000.0 * {lm_pc})) + ln(2000.0 / (dlq.dlq + 2000.0)))"
    o["ft_lmdirichlet_topk"] = _with(
        [
            "ttfq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term)",
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'CASE WHEN {lm_raw} > 0.0 THEN {lm_raw} ELSE 0.0 END')} AS score "
            f"FROM tf JOIN ttfq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # BooleanSimilarity: score = boost for every match (BooleanSimilarity.java:59-61)
    o["ft_boolean_sim"] = _with(
        [
            f"sc AS (SELECT doc_id, {_R('1.0')} AS score FROM tf WHERE term = '{RARE}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc", k=20),
    )

    # LMJelinekMercerSimilarity λ=0.7 (float32 constant): double
    # score = ln(1 + ((1-λ)·tf/dl) / (λ·p_c)), f32 cast
    # (LMJelinekMercerSimilarity.java:63-69, LMSimilarity.java:154-156)
    jm_lam = "CAST(0.7 AS REAL)"
    jm_pc = "((ttfq.ttf + 1.0) / ((SELECT sttf FROM st) + 1.0))"
    jm_raw = f"ln(1.0 + (((1.0 - {jm_lam}) * tf.tf / dlq.dlq)) / ({jm_lam} * {jm_pc}))"
    o["ft_lmjm_topk"] = _with(
        [
            "ttfq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term)",
            f"sc AS (SELECT tf.doc_id AS doc_id, {_R(jm_raw)} AS score "
            f"FROM tf JOIN ttfq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # DFR I(n)L2 (c=1): tfn = tf·log2(1 + avgdl/dl),
    # score = f32(A·(1 − 1/(1+tfn))), A = log2((N+1)/(df+0.5))
    # (BasicModelIn.java:33-44, NormalizationH2.java:58-60,
    # DFRSimilarity.java:110-114); avgdl double, log2 = ln(x)/ln(2)
    dfr_avgdl = _D("(SELECT sttf FROM st) / (SELECT n FROM st)")
    dfr_a = f"(ln(((SELECT n FROM st) + 1) / (dfreq.df + 0.5)) / ln(2.0))"
    dfr_tfn = f"(tf.tf * (ln(1.0 + {dfr_avgdl} / dlq.dlq) / ln(2.0)))"
    o["ft_dfr_inl2_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'{dfr_a} * (1.0 - 1.0 / (1.0 + {dfr_tfn}))')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # DFI chi-squared: expected = (ttf+1)·dl/(sttf+1); 0 when tf <= expected,
    # else log2((tf-expected)²/expected + 1), f32 cast (DFISimilarity.java:56-66)
    dfi_exp = "(((ttfq.ttf + 1.0) * dlq.dlq) / ((SELECT sttf FROM st) + 1.0))"
    dfi_raw = f"(ln((tf.tf - {dfi_exp}) * (tf.tf - {dfi_exp}) / {dfi_exp} + 1.0) / ln(2.0))"
    o["ft_dfi_topk"] = _with(
        [
            "ttfq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term)",
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'CASE WHEN tf.tf <= {dfi_exp} THEN 0.0 ELSE {dfi_raw} END')} AS score "
            f"FROM tf JOIN ttfq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # IB LL (lambda=DF, H2 c=1): λ = f32((df+1)/(N+1)),
    # tfn = tf·log2(1+avgdl/dl), score = f32(−ln(λ/(tfn+λ)))
    # (IBSimilarity.java:99-105, DistributionLL.java:33-36, LambdaDF.java:32-39)
    ib_lam = _R("((dfreq.df + 1.0) / ((SELECT n FROM st) + 1.0))")
    ib_tfn = f"(tf.tf * (ln(1.0 + {dfr_avgdl} / dlq.dlq) / ln(2.0)))"
    o["ft_ib_ll_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'-ln({ib_lam} / ({ib_tfn} + {ib_lam}))')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # Axiomatic F2 family (Axiomatic.java:104-112 with tf = ln = 1, gamma = 0):
    # tfln = tf/(tf + s + s·dl/avgdl) with s = 0.25 (exact in binary), then
    # f32(max(tfln·idf, 0)); k = f32(0.35) = 0.3499999940395355 written as the
    # exact double literal so DuckDB's pow sees the same exponent
    ax_k = repr(float(np.float32(0.35)))
    ax_tfln = f"(tf.tf / (tf.tf + 0.25 + 0.25 * dlq.dlq / {dfr_avgdl}))"
    ax_f2exp_idf = f"pow(((SELECT n FROM st) + 1.0) / dfreq.df, {ax_k})"
    o["ft_ax_f2exp_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'greatest({ax_tfln} * {ax_f2exp_idf}, 0.0)')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )
    ax_f2log_idf = "ln(((SELECT n FROM st) + 1.0) / dfreq.df)"
    o["ft_ax_f2log_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'greatest({ax_tfln} * {ax_f2log_idf}, 0.0)')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # ---- composable SimilarityBase family
    _TTFQ = "ttfq AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term)"
    # DFR G + AfterEffectB + NormalizationH1(c=1): λ = (ttf+1)/(N+ttf+1),
    # A = log2(λ+1), B = log2((1+λ)/λ), ae = (ttf+2)/(df+1),
    # tfn = tf·c·(avgdl/dl); score = f32((B − (B−A)/(1+tfn))·ae)
    # (BasicModelG.java:36-50, AfterEffectB.java:32-36, NormalizationH1.java:56-58)
    g_f = "(ttfq.ttf + 1.0)"
    g_lam = f"({g_f} / ((SELECT n FROM st) + {g_f}))"
    g_a = f"(ln({g_lam} + 1.0) / ln(2.0))"
    g_b = f"(ln((1.0 + {g_lam}) / {g_lam}) / ln(2.0))"
    g_ae = "((ttfq.ttf + 2.0) / (dfreq.df + 1))"
    g_tfn = f"(tf.tf * 1.0 * ({dfr_avgdl} / dlq.dlq))"
    o["ft_dfr_gb1_topk"] = _with(
        [
            _TTFQ,
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'({g_b} - ({g_b} - {g_a}) / (1.0 + {g_tfn})) * {g_ae}')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN ttfq USING (term) "
            f"JOIN dlq ON tf.doc_id = dlq.doc_id WHERE tf.term = '{HOT}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # DFR I(F) + AfterEffectB + H2(c=1): A = log2(1 + (N+1)/(F+0.5)) with
    # F = ttf, ae = (ttf+2)/(df+1), tfn = tf·log2(1+avgdl/dl);
    # score = f32(A·ae·(1 − 1/(1+tfn))) (BasicModelIF.java:34-45)
    if_a = "(ln(1.0 + ((SELECT n FROM st) + 1) / (ttfq.ttf + 0.5)) / ln(2.0))"
    if_tfn = f"(tf.tf * (ln(1.0 + {dfr_avgdl} / dlq.dlq) / ln(2.0)))"
    o["ft_dfr_ifb2_topk"] = _with(
        [
            _TTFQ,
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'{if_a} * {g_ae} * (1.0 - 1.0 / (1.0 + {if_tfn}))')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN ttfq USING (term) "
            f"JOIN dlq ON tf.doc_id = dlq.doc_id WHERE tf.term = '{MID2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # IB SPL + LambdaTTF + H2(c=1): λ = f32((ttf+1)/(N+1)), q = 1−1/(tfn+1),
    # score = f32(−ln((λ^q − λ)/(1 − λ))) (DistributionSPL.java:36-59,
    # LambdaTTF.java:32-38; the ulp nudges never fire for 0 < λ < 1, q < 1)
    spl_lam = _R("((ttfq.ttf + 1.0) / ((SELECT n FROM st) + 1.0))")
    spl_q = f"(1.0 - 1.0 / ({if_tfn} + 1.0))"
    o["ft_ib_spl_topk"] = _with(
        [
            _TTFQ,
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'-ln((pow({spl_lam}, {spl_q}) - {spl_lam}) / (1.0 - {spl_lam}))')} AS score "
            f"FROM tf JOIN ttfq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # DFI Saturated: expected = ((ttf+1)·dl)/(sttf+1); 0 when tf <= expected
    # else f32(log2((tf−e)/e + 1)) (DFISimilarity.java:55-65,
    # IndependenceSaturated.java:35-36)
    sat_exp = "(((ttfq.ttf + 1) * dlq.dlq) / ((SELECT sttf FROM st) + 1.0))"
    sat_raw = f"(ln((tf.tf - {sat_exp}) / {sat_exp} + 1.0) / ln(2.0))"
    o["ft_dfi_sat_topk"] = _with(
        [
            _TTFQ,
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'CASE WHEN tf.tf <= {sat_exp} THEN 0.0 ELSE {sat_raw} END')} AS score "
            f"FROM tf JOIN ttfq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # Axiomatic F1EXP (s=0.25, k=f32(0.35)): t = 1+ln(1+ln(tf+1)),
    # l = (avgdl+s)/(avgdl+dl·s), idf = pow((N+1)/df, k);
    # score = f32(max(((t·l)·idf)·1, 0)) (AxiomaticF1EXP.java:60-90)
    ax1_t = "(1.0 + ln(1.0 + ln(tf.tf + 1.0)))"
    ax1_l = f"(({dfr_avgdl} + 0.25) / ({dfr_avgdl} + dlq.dlq * 0.25))"
    o["ft_ax_f1exp_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'greatest(({ax1_t} * {ax1_l}) * {ax_f2exp_idf}, 0.0)')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # facet.query: count of (base AND bucket) per named bucket, zero rows kept
    o["agg_facet_query"] = _with(
        [
            f"basem AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}')",
            f"b1 AS (SELECT count(*) AS c FROM (SELECT DISTINCT doc_id FROM tf WHERE term = '{MID}') m JOIN basem USING (doc_id))",
            f"b2 AS (SELECT count(*) AS c FROM ("
            f"  SELECT a.doc_id FROM (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT2}') a "
            f"  JOIN (SELECT DISTINCT doc_id FROM tf WHERE term = '{RARE}') b USING (doc_id)"
            f") m JOIN basem USING (doc_id))",
        ],
        "SELECT * FROM (VALUES"
        " ('has_mid', CAST((SELECT c FROM b1) AS BIGINT)),"
        " ('hot2_and_rare', CAST((SELECT c FROM b2) AS BIGINT)),"
        " ('ghost', CAST(0 AS BIGINT))"
        ") AS t(bucket, cnt) ORDER BY bucket",
    )

    # HighFreqTerms -t: top-20 by totalTermFreq, (ttf desc, term desc)
    o["ft_high_freq_terms"] = _with(
        [
            "hft AS (SELECT term, CAST(count(*) AS BIGINT) AS df, "
            "CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term)"
        ],
        "SELECT term, df, ttf FROM hft ORDER BY ttf DESC, term DESC LIMIT 20",
    )

    # LegacyBM25 (misc/search/similarity/LegacyBM25Similarity.java:66-68):
    # the BM25 scorer with boost·(1+k1) — f32(2.2)·idf replaces idf
    lb_t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    lb_w = _R(f"{_R(_R('1.0') + ' * ' + _R('1.0 + ' + _R('1.2')))} * {_idf('dfreq.df')}")
    o["ft_legacy_bm25_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, {_R(f'{lb_w} * {lb_t32}')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{MID}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # Axiomatic F3LOG (s=0.25, queryLen=1): gamma = ((dl−1)·s·1)/avgdl;
    # score = f32(max(t·idf − gamma, 0)) (AxiomaticF3LOG.java:45-82)
    ax3_gamma = f"((dlq.dlq - 1) * 0.25 * 1 / {dfr_avgdl})"
    o["ft_ax_f3log_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, "
            f"{_R(f'greatest({ax1_t} * {ax_f2log_idf} - {ax3_gamma}, 0.0)')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # MultiSimilarity(Classic, Boolean): float32 running sum of sub-scores
    # (MultiSimilarity.java:66-71) — f32(classic + 1.0f)
    ms_idf = _R("ln(((SELECT n FROM st) + 1) / (dfreq.df + 1)) + 1.0")
    ms_raw = _R(f"{_R('sqrt(tf.tf)')} * {ms_idf}")
    ms_classic = _R(f"{ms_raw} * {_R('1.0 / sqrt(dlq.dlq)')}")
    o["ft_multisim_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, {_R(ms_classic + ' + ' + _R('1.0'))} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT2}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # CommonTermsQuery: dynamic df classification against the same threshold
    # the engine computes — ceil(f32(0.5) * f32(maxDoc)) (CommonTermsQuery.
    # java:160-163) — then score = f32( f64(f32 low-group sum) + f64(f32
    # high-group sum if matched) ): the MUST(low)+SHOULD(high) boolean chain
    ct_terms = f"('{HOT}', '{HOT2}', '{MID}', '{RARE}')"
    ct_thr = (
        "CAST(ceil(CAST(CAST(CAST(0.5 AS REAL) * CAST((SELECT n FROM st) AS REAL) AS REAL) AS DOUBLE)) AS BIGINT)"
    )
    ct_t32 = _R(f"tf.tf / (tf.tf + {_D(_CACHE)})")
    ct_score = _R(f"{_idf('qt.df')} * {ct_t32}")
    o["ft_common_terms"] = _with(
        [
            f"qt AS (SELECT term, df, CASE WHEN df > {ct_thr} THEN 1 ELSE 0 END AS hi "
            f"FROM dfreq WHERE term IN {ct_terms})",
            f"ctsc AS (SELECT tf.doc_id AS doc_id, qt.hi AS hi, {ct_score} AS score "
            f"FROM tf JOIN qt USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id)",
            f"lo AS (SELECT doc_id, {_R('sum(' + _D('score') + ')')} AS score FROM ctsc WHERE hi = 0 GROUP BY doc_id)",
            f"hig AS (SELECT doc_id, {_R('sum(' + _D('score') + ')')} AS score FROM ctsc WHERE hi = 1 GROUP BY doc_id)",
        ],
        _topk_sql(
            f"SELECT lo.doc_id AS doc_id, "
            f"{_R(_D('lo.score') + ' + coalesce(' + _D('hig.score') + ', 0.0)')} AS score "
            "FROM lo LEFT JOIN hig ON lo.doc_id = hig.doc_id"
        ),
    )

    # CoveringQuery: n_match >= max(1, n_chars % 2 + 1), score = sum of
    # matching clauses (f32 leaves, double sum, f32 cast)
    cv_score = _R(f"{_idf('dfreq.df')} * {ct_t32}")
    o["ft_covering"] = _with(
        [
            f"cvsc AS (SELECT tf.doc_id AS doc_id, {cv_score} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term IN ('{HOT}', '{HOT2}', '{MID}'))",
            f"cva AS (SELECT doc_id, {_R('sum(' + _D('score') + ')')} AS score, count(*) AS n_match "
            "FROM cvsc GROUP BY doc_id)",
        ],
        _topk_sql(
            "SELECT cva.doc_id AS doc_id, cva.score AS score FROM cva "
            "JOIN documents d ON cva.doc_id = d.doc_id "
            "WHERE cva.n_match >= greatest(1, d.n_chars % 2 + 1)"
        ),
    )

    o["ft_terms_enum"] = _with(
        [],
        "SELECT term, CAST(df AS BIGINT) AS df FROM dfreq "
        "WHERE term LIKE 's%' AND df >= 2 ORDER BY df DESC, term ASC LIMIT 15",
    )
    o["ft_term_vectors"] = _with(
        [],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, term, CAST(tf AS BIGINT) AS tf "
        "FROM tf WHERE doc_id IN (7, 42, 123) ORDER BY doc_id, term",
    )

    # shingle index: bigram tf/df from positional self-join; dl / avgdl are
    # the unigram field length (overlap tokens discounted on both sides —
    # see Analyzer.shingles docstring)
    o["ft_shingle_topk"] = _with(
        [
            tokp,
            f"btf AS (SELECT a.doc_id AS doc_id, count(*) AS tf FROM tokp a "
            f"JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            f"WHERE a.term = '{HOT}' AND b.term = '{HOT2}' GROUP BY a.doc_id)",
            "bdf AS (SELECT count(*) AS df FROM btf)",
            f"sc AS (SELECT btf.doc_id AS doc_id, "
            + _R(
                _idf("(SELECT df FROM bdf)")
                + " * "
                + _R(f"btf.tf / (btf.tf + {_D(_CACHE)})")
            )
            + " AS score FROM btf JOIN dlq ON btf.doc_id = dlq.doc_id)",
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # common-grams index: gram 'a_scan' tf = adjacent (a, scan) pairs; dl is
    # the unigram count (grams are posIncr-0 overlaps) — the shared dlq/cache
    o["ft_common_grams_topk"] = _with(
        [
            tokp,
            f"cgtf AS (SELECT a.doc_id AS doc_id, count(*) AS tf FROM tokp a "
            f"JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            f"WHERE a.term = 'a' AND b.term = '{HOT}' GROUP BY a.doc_id)",
            "cgdf AS (SELECT count(*) AS df FROM cgtf)",
            f"sc AS (SELECT cgtf.doc_id AS doc_id, "
            + _R(
                _idf("(SELECT df FROM cgdf)")
                + " * "
                + _R(f"cgtf.tf / (cgtf.tf + {_D(_CACHE)})")
            )
            + " AS score FROM cgtf JOIN dlq ON cgtf.doc_id = dlq.doc_id)",
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # edge-ngram(2,4) index: tf of gram 'sca' = tokens with that 3-prefix;
    # dl = emitting tokens (length >= min_gram); own byte4 quantization,
    # collection stats, and float32 BM25 cache over the re-derived lengths
    _eg_gram = HOT[:3]
    _eg_dlq_case = (
        "CASE WHEN dl < 24 THEN dl ELSE 24 + (CASE WHEN dl-24 < 8 THEN dl-24 "
        "ELSE ((dl-24) >> (length(bin(dl-24))-4)) << (length(bin(dl-24))-4) END) END"
    )
    _eg_avg = _R("(SELECT sttf FROM st2) / (SELECT n FROM st2)")
    _eg_cache = _R(
        _R("1.2") + " * " + _R(_R("0.25") + " + " + _R(_R(_R("0.75") + " * " + _R("dlq2.dlq")) + " / " + _eg_avg))
    )
    _eg_idf = _R(
        "ln(1 + ((SELECT n FROM st2) - (SELECT df FROM gdf) + 0.5) / ((SELECT df FROM gdf) + 0.5))"
    )
    _eg_t32 = _R(f"gtf.tf / (gtf.tf + {_D(_eg_cache)})")
    o["ft_edge_ngram_topk"] = _with(
        [
            f"gtf AS (SELECT doc_id, count(*) AS tf FROM tok "
            f"WHERE length(term) >= 3 AND substr(term, 1, 3) = '{_eg_gram}' GROUP BY doc_id)",
            "gdf AS (SELECT count(*) AS df FROM gtf)",
            "dl2 AS (SELECT d.doc_id, coalesce(t.c, 0) AS dl FROM documents d LEFT JOIN "
            "(SELECT doc_id, count(*) AS c FROM tok WHERE length(term) >= 2 GROUP BY doc_id) t "
            "ON d.doc_id = t.doc_id)",
            f"dlq2 AS (SELECT doc_id, {_eg_dlq_case} AS dlq FROM dl2)",
            "st2 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS DOUBLE) AS sttf FROM dl2)",
            f"sc AS (SELECT gtf.doc_id AS doc_id, {_R(_eg_idf + ' * ' + _eg_t32)} AS score "
            f"FROM gtf JOIN dlq2 ON gtf.doc_id = dlq2.doc_id)",
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # synonym replace-mode index: remap the token stream, recompute tf/df for
    # the merged term; dl is invariant under a 1:1 token map
    syn_map_t32 = _R(f"stf.tf / (stf.tf + {_D(_CACHE)})")
    o["ft_synmap_topk"] = _with(
        [
            f"stok AS (SELECT doc_id, CASE WHEN term = '{MID2}' THEN '{MID}' ELSE term END AS term FROM tok)",
            f"stf AS (SELECT doc_id, count(*) AS tf FROM stok WHERE term = '{MID}' GROUP BY doc_id)",
            "sdf AS (SELECT count(*) AS df FROM stf)",
            f"sc AS (SELECT stf.doc_id AS doc_id, "
            + _R(_idf("(SELECT df FROM sdf)") + " * " + syn_map_t32)
            + " AS score FROM stf JOIN dlq ON stf.doc_id = dlq.doc_id)",
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # WDGF index over the '-'-paired corpus: the generated parts restore the
    # original unigram stream (tf/df/dl/positions unchanged — catenations are
    # posIncr-0 overlaps at their span start, discounted from dl), so the
    # catenated term's stats come from the odd-boundary pair join on the
    # UNtransformed tokens and everything else is the shared _BASE
    wdgf_t32 = _R(f"ctf.tf / (ctf.tf + {_D(_CACHE)})")
    o["ft_wdgf_topk"] = _with(
        [
            tokp,
            f"ctf AS (SELECT a.doc_id AS doc_id, count(*) AS tf FROM tokp a "
            f"JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            f"WHERE a.pos % 2 = 1 AND a.term = '{HOT}' AND b.term = '{HOT2}' "
            f"GROUP BY a.doc_id)",
            "cdf AS (SELECT count(*) AS df FROM ctf)",
            f"sc AS (SELECT ctf.doc_id AS doc_id, "
            + _R(_idf("(SELECT df FROM cdf)") + " * " + wdgf_t32)
            + " AS score FROM ctf JOIN dlq ON ctf.doc_id = dlq.doc_id)",
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # parts restore the unigram stream exactly: the WDGF index's 'scan'
    # ranking IS the plain index's ranking
    o["ft_wdgf_parts_topk"] = _with(
        [_term_cte("sc", HOT)], _topk_sql("SELECT doc_id, score FROM sc")
    )

    # phonetic: the SAME Soundex rewrite system replayed in SQL (both engines
    # run the identical substitution schedule — see functions/phonetic.py)
    from .functions.phonetic import soundex_sql_expr

    o["ft_phonetic"] = _with(
        [],
        f"SELECT term, CAST(df AS BIGINT) AS df FROM dfreq "
        f"WHERE {soundex_sql_expr('term')} = {soundex_sql_expr(chr(39) + 'scann' + chr(39))} "
        "ORDER BY df DESC, term ASC LIMIT 10",
    )

    o["ft_infix_suggest"] = _with(
        [],
        "SELECT term, CAST(df AS BIGINT) AS df FROM dfreq "
        "WHERE term LIKE '%or%' ORDER BY df DESC, term ASC LIMIT 10",
    )

    wb_word = HOT + HOT2
    o["ft_word_break"] = _with(
        [
            f"parts AS (SELECT i, substr('{wb_word}', 1, i) AS a, substr('{wb_word}', i + 1) AS b "
            f"FROM generate_series(1, {len(wb_word) - 1}) t(i))",
            "wb AS (SELECT parts.i AS i, parts.a AS a, parts.b AS b, fa.df + fb.df AS freq_sum "
            "FROM parts JOIN dfreq fa ON fa.term = parts.a JOIN dfreq fb ON fb.term = parts.b)",
        ],
        "SELECT a AS left_term, b AS right_term, CAST(freq_sum AS BIGINT) AS freq_sum "
        "FROM wb ORDER BY freq_sum DESC, i ASC LIMIT 5",
    )

    # repetition stats: integer-exact re-derivation over the same token CTEs
    o["ta_repetition"] = _with(
        [
            tokp,
            "bgt AS (SELECT a.doc_id AS doc_id, a.term || ' ' || b.term AS bg "
            "FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)",
            "bgc AS (SELECT doc_id, max(c) AS max_bg, sum(c) AS n_bg FROM "
            "(SELECT doc_id, bg, count(*) AS c FROM bgt GROUP BY doc_id, bg) GROUP BY doc_id)",
            "uni AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_unique "
            "FROM tok GROUP BY doc_id)",
        ],
        "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
        "CAST(coalesce(uni.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "CAST(coalesce(uni.n_unique, 0) AS BIGINT) AS n_unique, "
        "CAST(CASE WHEN coalesce(uni.n_tokens, 0) = 0 THEN 0 ELSE "
        "floor(CAST(uni.n_tokens - uni.n_unique AS BIGINT) * 1000000 / uni.n_tokens) END AS BIGINT) AS dup_unigram_q, "
        "CAST(CASE WHEN coalesce(uni.n_tokens, 0) < 2 THEN 0 ELSE "
        "floor(CAST(bgc.max_bg AS BIGINT) * 1000000 / (uni.n_tokens - 1)) END AS BIGINT) AS top_bigram_q "
        "FROM documents d LEFT JOIN uni ON d.doc_id = uni.doc_id "
        "LEFT JOIN bgc ON d.doc_id = bgc.doc_id ORDER BY doc_id",
    )

    o["ft_frange"] = (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents "
        "WHERE (1000 / (n_chars * 1 + 1000)) >= 0.7 AND (1000 / (n_chars * 1 + 1000)) <= 0.9 "
        "ORDER BY doc_id LIMIT 30"
    )

    # SweetSpot: Classic tf/idf with the plateau norm
    # f32(1/sqrt(f32(f32(0.5)·f32(|L−1|+|L−40|−39)) + f32(1)))
    ss_iarg = "abs(dlq.dlq - 1) + abs(dlq.dlq - 40) - 39"
    ss_arg = _R(_R(_R("0.5") + " * " + _R(ss_iarg)) + " + " + _R("1.0"))
    ss_nt = _R(f"1.0 / sqrt({_D(ss_arg)})")
    ss_idf = _R("ln(((SELECT n FROM st) + 1) / (dfreq.df + 1)) + 1.0")
    ss_raw = _R(f"{_R('sqrt(tf.tf)')} * {ss_idf}")
    o["ft_sweetspot_topk"] = _with(
        [
            f"sc AS (SELECT tf.doc_id AS doc_id, {_R(f'{ss_raw} * {ss_nt}')} AS score "
            f"FROM tf JOIN dfreq USING (term) JOIN dlq ON tf.doc_id = dlq.doc_id "
            f"WHERE tf.term = '{HOT}')"
        ],
        _topk_sql("SELECT doc_id, score FROM sc"),
    )

    # diversified top-k: per-key rank cap, then global (score desc, doc asc)
    o["ft_diversified"] = _with(
        [
            _term_cte("sc", HOT),
            "dv AS (SELECT sc.doc_id AS doc_id, sc.score AS score, d.lang AS lang, "
            "row_number() OVER (PARTITION BY d.lang ORDER BY sc.score DESC, sc.doc_id ASC) AS r "
            "FROM sc JOIN documents d ON sc.doc_id = d.doc_id)",
        ],
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        "CAST(doc_id AS BIGINT) AS doc_id, lang FROM dv WHERE r <= 2 "
        "ORDER BY score DESC, doc_id ASC LIMIT 10",
    )

    # DocValuesStats: the identical exact-integer-sums -> double formula
    o["agg_docvalues_stats"] = _with(
        [
            f"m AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}')",
            "v AS (SELECT d.n_chars AS v FROM m JOIN documents d ON m.doc_id = d.doc_id)",
            "s AS (SELECT CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing, "
            "CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v, "
            "CAST(sum(v) AS BIGINT) AS sum_v, "
            "CAST(sum(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS BIGINT) AS sum_sq FROM v)",
        ],
        "SELECT cnt, missing, min_v, max_v, sum_v, "
        "CAST(floor(CAST(sum_v AS DOUBLE) / cnt * 1e6) AS BIGINT) AS mean_x1e6, "
        "CAST(floor((CAST(sum_sq AS DOUBLE) / cnt - (CAST(sum_v AS DOUBLE) / cnt) * (CAST(sum_v AS DOUBLE) / cnt)) * 1e3) AS BIGINT) AS varp_x1e3 "
        "FROM s",
    )

    # query elevation: pinned [42, 7] head, banned {3}, organic fill
    o["ft_elevate"] = _with(
        [
            _term_cte("sc", HOT),
            "org AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r "
            "FROM sc WHERE doc_id NOT IN (42, 7, 3))",
        ],
        "SELECT CAST(rank AS INT) AS rank, CAST(doc_id AS BIGINT) AS doc_id, elevated FROM ("
        "  SELECT 1 AS rank, 42 AS doc_id, TRUE AS elevated"
        "  UNION ALL SELECT 2, 7, TRUE"
        "  UNION ALL SELECT r + 2, doc_id, FALSE FROM org WHERE r <= 8"
        ") ORDER BY rank",
    )

    # FeatureField saturation: quantize the INTEGER feature by keeping its
    # top 9 significant bits (== dropping the low 15 float32 mantissa bits
    # for values < 2^24), then the all-float32 chain w*(1 - p/(f+p))
    fq = (
        "CASE WHEN length(bin(n_chars)) <= 9 THEN n_chars "
        "ELSE (n_chars >> (length(bin(n_chars)) - 9)) << (length(bin(n_chars)) - 9) END"
    )
    fsat = _R(
        _R("2.0") + " * " + _R(_R("1.0") + " - " + _R(_R("256.0") + f" / ({_R(fq)} + {_R('256.0')})"))
    )
    o["ft_feature_saturation"] = (
        f"SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"CAST(doc_id AS BIGINT) AS doc_id FROM "
        f"(SELECT doc_id, {fsat} AS score FROM documents WHERE n_chars IS NOT NULL) "
        f"ORDER BY score DESC, doc_id ASC LIMIT 15"
    )

    # batch search: union of the three per-query top-10s
    bs_and = _R(_D("a2.score") + " + " + _D("b2.score"))
    bs_or = _R("sum(" + _D("score") + ")")
    o["ft_batch_search"] = _with(
        [
            _term_cte("sa", MID),
            _term_cte("a2", HOT),
            _term_cte("b2", HOT2),
            _term_cte("c1", MID2),
            _term_cte("c2", RARE),
            "qa AS (SELECT 'a' AS query_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
            "doc_id FROM sa ORDER BY score DESC, doc_id ASC LIMIT 10)",
            f"qb0 AS (SELECT a2.doc_id AS doc_id, {bs_and} AS score FROM a2 JOIN b2 ON a2.doc_id = b2.doc_id)",
            "qb AS (SELECT 'b' AS query_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
            "doc_id FROM qb0 ORDER BY score DESC, doc_id ASC LIMIT 10)",
            f"qc0 AS (SELECT doc_id, {bs_or} AS score FROM "
            "(SELECT * FROM c1 UNION ALL SELECT * FROM c2) GROUP BY doc_id)",
            "qc AS (SELECT 'c' AS query_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
            "doc_id FROM qc0 ORDER BY score DESC, doc_id ASC LIMIT 10)",
        ],
        "SELECT query_id, rank, CAST(doc_id AS BIGINT) AS doc_id FROM "
        "(SELECT * FROM qa UNION ALL SELECT * FROM qb UNION ALL SELECT * FROM qc) "
        "ORDER BY query_id, rank",
    )

    # interval facets: independent membership per interval over the HOT
    # match set (IntervalFacets.java) — counts emitted as (interval, cnt)
    _iv = {
        "[*,200)": "_v < 200",
        "[100,400)": "_v >= 100 AND _v < 400",
        "[200,800]": "_v >= 200 AND _v <= 800",
        "(400,*]": "_v > 400",
    }
    _iv_rows = " UNION ALL ".join(
        f"SELECT '{spec}' AS \"interval\", CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS cnt FROM mv"
        for spec, cond in _iv.items()
    )
    o["agg_interval_facet"] = _with(
        [
            f"m AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{HOT}')",
            "mv AS (SELECT d.n_chars AS _v FROM m JOIN documents d USING (doc_id))",
        ],
        f"SELECT * FROM ({_iv_rows}) ORDER BY \"interval\"",
    )

    # heatmap grid facet: quantized points binned into a 6x8 grid
    o["geo_heatmap"] = (
        f"WITH {_geo_pts}, {_geo_q} "
        "SELECT CAST(least(floor((qlat - (-60.0)) / 20.0), 5) AS INT) AS row, "
        "CAST(least(floor((qlon - (-120.0)) / 30.0), 7) AS INT) AS col, "
        "CAST(count(*) AS BIGINT) AS cnt FROM q "
        "WHERE qlat >= -60.0 AND qlat <= 60.0 AND qlon >= -120.0 AND qlon <= 120.0 "
        "GROUP BY 1, 2 ORDER BY row, col"
    )

    # FreeTextSuggester: stupid-backoff trigram LM for key 'row data s'.
    # Levels (attempted high→low, each consuming one ALPHA factor):
    #   L2 grams LIKE 'row data s%' ctx = cnt('row data'), backoff 1.0
    #   L1 grams LIKE 'data s%'     ctx = cnt('data'),     backoff 0.4
    #   L0 grams LIKE 's%'          ctx = totTokens,       backoff 0.4*0.4
    # per-level acceptance: top-8 by (cnt desc, gram asc) excluding last
    # words already accepted at higher levels (the `seen` set); final order
    # (score desc, suggestion asc) — score in the exact double arithmetic of
    # the engine: ((2^63 * backoff) * cnt) / ctx.
    _b1, _b2 = repr(0.4), repr(0.4 * 0.4)

    def _ft_score(backoff: str, cnt: str, ctx: str) -> str:
        return (
            f"((9.223372036854775808e18 * CAST({backoff} AS DOUBLE)) * CAST({cnt} AS DOUBLE))"
            f" / CAST({ctx} AS DOUBLE)"
        )

    o["ft_freetext"] = f"""
WITH tokf AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
u AS (SELECT unnest(toks) AS gram FROM tokf),
uc AS (SELECT gram, count(*) AS cnt FROM u GROUP BY gram),
b AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram FROM tokf),
bc AS (SELECT gram, count(*) AS cnt FROM b GROUP BY gram),
t AS (SELECT unnest(list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram FROM tokf),
tc AS (SELECT gram, count(*) AS cnt FROM t GROUP BY gram),
tot AS (SELECT sum(cnt) AS n FROM uc),
l2 AS (SELECT gram, cnt, string_split(gram, ' ')[3] AS w,
              row_number() OVER (ORDER BY cnt DESC, gram ASC) AS rn
       FROM tc WHERE gram LIKE 'row data s%'),
a2 AS (SELECT gram, cnt, w, {_ft_score('1.0', 'cnt', "(SELECT cnt FROM bc WHERE gram = 'row data')")} AS score
       FROM l2 WHERE rn <= 8),
l1 AS (SELECT gram, cnt, string_split(gram, ' ')[2] AS w,
              row_number() OVER (ORDER BY cnt DESC, gram ASC) AS rn
       FROM bc WHERE gram LIKE 'data s%' AND string_split(gram, ' ')[2] NOT IN (SELECT w FROM a2)),
a1 AS (SELECT gram, cnt, w, {_ft_score(_b1, 'cnt', "(SELECT cnt FROM uc WHERE gram = 'data')")} AS score
       FROM l1 WHERE rn <= 8),
l0 AS (SELECT gram, cnt, gram AS w,
              row_number() OVER (ORDER BY cnt DESC, gram ASC) AS rn
       FROM uc WHERE gram LIKE 's%'
         AND gram NOT IN (SELECT w FROM a2 UNION ALL SELECT w FROM a1)),
a0 AS (SELECT gram, cnt, w, {_ft_score(_b2, 'cnt', '(SELECT n FROM tot)')} AS score
       FROM l0 WHERE rn <= 8),
allr AS (SELECT * FROM a2 UNION ALL SELECT * FROM a1 UNION ALL SELECT * FROM a0)
SELECT CAST(row_number() OVER (ORDER BY score DESC, gram ASC) AS INT) AS rank, gram AS suggestion
FROM allr ORDER BY score DESC, gram ASC LIMIT 8
"""

    # LTR rerank: the model objects generate their own float32-exact SQL —
    # one definition drives both the Spark plan and the oracle
    _ltr_exprs = {"orig": _R("c.score"), "nch": _R("d.n_chars")}
    for _name, _model in (("ltr_linear", _LTR_LINEAR), ("ltr_trees", _LTR_TREES)):
        _normed = {
            f.name: f.norm.sql(_ltr_exprs[f.name]) for f in _model.features
        }
        o[_name] = _with(
            [
                _term_cte("sa", HOT),
                "c AS (SELECT doc_id, score FROM sa ORDER BY score DESC, doc_id ASC LIMIT 40)",
                f"m AS (SELECT c.doc_id AS doc_id, {_model.sql(_normed)} AS score "
                "FROM c JOIN documents d ON c.doc_id = d.doc_id)",
            ],
            _topk_sql("SELECT doc_id, score FROM m", k=10),
        )

    # ---- BM25F (sandbox BM25FQuery + MultiNormsLeafSimScorer): fields
    # text (w=1) / title = first-5-tokens (w=2), terms (HOT, MID).
    # Pseudo stats: df = max over (field, term); ttf/sumTotalTermFreq =
    # weight-summed (integral weights => exact); per-doc freq = w-summed tf;
    # per-doc norm = byte4-requantized w-sum of decoded per-field lengths.
    def _q4(x: str) -> str:
        d = f"({x}-24)"
        return (
            f"CASE WHEN {x} < 24 THEN {x} ELSE 24 + (CASE WHEN {d} < 8 THEN {d} "
            f"ELSE ({d} >> (length(bin({d}))-4)) << (length(bin({d}))-4) END) END"
        )

    _bm_av = _R("CAST((SELECT sttf FROM bst) AS DOUBLE) / (SELECT n FROM st)")
    _bm_c1 = _R(_R("0.75") + " * " + _R("bb.bl"))
    _bm_c2 = _R(f"{_bm_c1} / {_bm_av}")
    _bm_c3 = _R(_R("0.25") + " + " + _bm_c2)
    _bm_cache = _R(_R("1.2") + " * " + _bm_c3)
    _bm_t32 = _R(f"bb.freq / (bb.freq + {_D(_bm_cache)})")
    _bm_score = _R(f"{_idf('(SELECT df FROM bdf)')} * {_bm_t32}")
    o["ft_bm25f"] = _with(
        [
            "ttl AS (SELECT doc_id, array_to_string(list_slice("
            "regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5), ' ') AS title FROM documents)",
            "tokt AS (SELECT doc_id, unnest(regexp_extract_all(title, '[a-z0-9]+')) AS term FROM ttl)",
            "dl2 AS (SELECT d.doc_id, count(t.term) AS dl FROM documents d "
            "LEFT JOIN tokt t ON d.doc_id = t.doc_id GROUP BY d.doc_id)",
            f"q2 AS (SELECT doc_id, {_q4('dl')} AS q FROM dl2)",
            "tf2 AS (SELECT term, doc_id, count(*) AS tf FROM tokt GROUP BY term, doc_id)",
            "bst AS (SELECT (SELECT CAST(sum(dl) AS BIGINT) FROM dl) "
            "+ 2*(SELECT CAST(sum(dl) AS BIGINT) FROM dl2) AS sttf)",
            "bdf AS (SELECT greatest("
            f"coalesce((SELECT df FROM dfreq WHERE term='{HOT}'),0),"
            f"coalesce((SELECT df FROM dfreq WHERE term='{MID}'),0),"
            f"coalesce((SELECT count(*) FROM tf2 WHERE term='{HOT}'),0),"
            f"coalesce((SELECT count(*) FROM tf2 WHERE term='{MID}'),0)) AS df)",
            "fr AS (SELECT doc_id, CAST(sum(wtf) AS DOUBLE) AS freq FROM ("
            f"SELECT doc_id, sum(tf) AS wtf FROM tf WHERE term IN ('{HOT}','{MID}') GROUP BY doc_id "
            f"UNION ALL SELECT doc_id, 2*sum(tf) FROM tf2 WHERE term IN ('{HOT}','{MID}') "
            "GROUP BY doc_id) GROUP BY doc_id)",
            "bn AS (SELECT fr.doc_id AS doc_id, fr.freq AS freq, (dlq.dlq + 2*q2.q) AS nv "
            "FROM fr JOIN dlq ON fr.doc_id = dlq.doc_id JOIN q2 ON fr.doc_id = q2.doc_id)",
            f"bb AS (SELECT doc_id, freq, {_q4('nv')} AS bl FROM bn)",
        ],
        _topk_sql(f"SELECT bb.doc_id AS doc_id, {_bm_score} AS score FROM bb"),
    )

    # ---- DisMaxQParser: qf = text^1 title^2, tie=0.3, mm=2, pf=text.
    # Per word: cross-field DisjunctionMax f32(m + 0.3*(s-m)); main = f32
    # double-sum with HAVING count>=2 (mm); pf phrase joins in as SHOULD.
    _dx_av2 = _R("(SELECT sttf FROM dst2) / (SELECT n FROM st)")

    def _dx_title_cte(alias: str, term: str) -> str:
        idf2 = _R(f"ln(1 + ((SELECT n FROM st) - ddf2.df + 0.5) / (ddf2.df + 0.5))")
        c1 = _R(_R("0.75") + " * " + _R("dq2.q"))
        c2 = _R(f"{c1} / {_dx_av2}")
        c3 = _R(_R("0.25") + " + " + c2)
        cache2 = _R(_R("1.2") + " * " + c3)
        w2 = _R("CAST(2.0 AS REAL) * " + idf2)
        t32 = _R(f"dtf2.tf / (dtf2.tf + {_D(cache2)})")
        return (
            f"{alias} AS (SELECT dtf2.doc_id AS doc_id, {_R(w2 + ' * ' + t32)} AS score "
            "FROM dtf2 JOIN ddf2 USING (term) JOIN dq2 ON dtf2.doc_id = dq2.doc_id "
            f"WHERE dtf2.term = '{term}')"
        )

    def _dx_dmx(alias: str, a: str, b: str) -> str:
        return (
            f"{alias} AS (SELECT doc_id, {dm_score} AS score "
            f"FROM (SELECT * FROM {a} UNION ALL SELECT * FROM {b}) GROUP BY doc_id)"
        )

    o["ft_dismax_qf"] = _with(
        [
            phrase_cte,
            "dttl AS (SELECT doc_id, array_to_string(list_slice("
            "regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5), ' ') AS title FROM documents)",
            "dtokt AS (SELECT doc_id, unnest(regexp_extract_all(title, '[a-z0-9]+')) AS term FROM dttl)",
            "ddl2 AS (SELECT d.doc_id, count(t.term) AS dl FROM documents d "
            "LEFT JOIN dtokt t ON d.doc_id = t.doc_id GROUP BY d.doc_id)",
            f"dq2 AS (SELECT doc_id, {_q4('dl')} AS q FROM ddl2)",
            "dtf2 AS (SELECT term, doc_id, count(*) AS tf FROM dtokt GROUP BY term, doc_id)",
            "ddf2 AS (SELECT term, count(*) AS df FROM dtf2 GROUP BY term)",
            "dst2 AS (SELECT CAST(sum(dl) AS DOUBLE) AS sttf FROM ddl2)",
            _term_cte("dta", HOT),
            _term_cte("dtb", HOT2),
            _dx_title_cte("dtta", HOT),
            _dx_title_cte("dttb", HOT2),
            _dx_dmx("dmxa", "dta", "dtta"),
            _dx_dmx("dmxb", "dtb", "dttb"),
            "dmain AS (SELECT doc_id, "
            + _R("sum(" + _D("score") + ")")
            + " AS score FROM (SELECT * FROM dmxa UNION ALL SELECT * FROM dmxb) "
            "GROUP BY doc_id HAVING count(*) >= 2)",
            f"dph AS ({ph_body})",
        ],
        _topk_sql(
            "SELECT dmain.doc_id AS doc_id, "
            + _R(_D("dmain.score") + " + coalesce(" + _D("dph.score") + ", 0)")
            + " AS score FROM dmain LEFT JOIN dph ON dmain.doc_id = dph.doc_id"
        ),
    )

    # ---- eDisMax pf2: 3-word query (HOT HOT2 MID), mm=2, bigram windows
    # ("HOT HOT2", "HOT2 MID") each an exact-phrase boost on text, windows
    # OR-summed f32(Σ double) into one SHOULD clause.
    def _dx_phrase_cte(alias: str, t1: str, t2: str) -> str:
        ptf = (
            "len(regexp_extract_all(' ' || replace(array_to_string("
            "regexp_extract_all(lower(text), '[a-z0-9]+'), ' '), ' ', '  ') || ' ', "
            f"' {t1}  {t2} '))"
        )
        w = _R(
            _D(_idf(f"(SELECT df FROM dfreq WHERE term = '{t1}')"))
            + " + "
            + _D(_idf(f"(SELECT df FROM dfreq WHERE term = '{t2}')"))
        )
        t32 = _R(f"p.ptf / (p.ptf + {_D(_CACHE)})")
        return (
            f"{alias} AS (SELECT p.doc_id AS doc_id, {_R(w + ' * ' + t32)} AS score "
            f"FROM (SELECT doc_id, {ptf} AS ptf FROM documents) p "
            "JOIN dlq ON p.doc_id = dlq.doc_id WHERE p.ptf > 0)"
        )

    o["ft_edismax_pf2"] = _with(
        [
            "dttl AS (SELECT doc_id, array_to_string(list_slice("
            "regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 5), ' ') AS title FROM documents)",
            "dtokt AS (SELECT doc_id, unnest(regexp_extract_all(title, '[a-z0-9]+')) AS term FROM dttl)",
            "ddl2 AS (SELECT d.doc_id, count(t.term) AS dl FROM documents d "
            "LEFT JOIN dtokt t ON d.doc_id = t.doc_id GROUP BY d.doc_id)",
            f"dq2 AS (SELECT doc_id, {_q4('dl')} AS q FROM ddl2)",
            "dtf2 AS (SELECT term, doc_id, count(*) AS tf FROM dtokt GROUP BY term, doc_id)",
            "ddf2 AS (SELECT term, count(*) AS df FROM dtf2 GROUP BY term)",
            "dst2 AS (SELECT CAST(sum(dl) AS DOUBLE) AS sttf FROM ddl2)",
            _term_cte("dta", HOT),
            _term_cte("dtb", HOT2),
            _term_cte("dtc", MID),
            _dx_title_cte("dtta", HOT),
            _dx_title_cte("dttb", HOT2),
            _dx_title_cte("dttc", MID),
            _dx_dmx("dmxa", "dta", "dtta"),
            _dx_dmx("dmxb", "dtb", "dttb"),
            _dx_dmx("dmxc", "dtc", "dttc"),
            "dmain AS (SELECT doc_id, "
            + _R("sum(" + _D("score") + ")")
            + " AS score FROM (SELECT * FROM dmxa UNION ALL SELECT * FROM dmxb "
            "UNION ALL SELECT * FROM dmxc) GROUP BY doc_id HAVING count(*) >= 2)",
            _dx_phrase_cte("dbg1", HOT, HOT2),
            _dx_phrase_cte("dbg2", HOT2, MID),
            "dpf2 AS (SELECT doc_id, "
            + _R("sum(" + _D("score") + ")")
            + " AS score FROM (SELECT * FROM dbg1 UNION ALL SELECT * FROM dbg2) GROUP BY doc_id)",
        ],
        _topk_sql(
            "SELECT dmain.doc_id AS doc_id, "
            + _R(_D("dmain.score") + " + coalesce(" + _D("dpf2.score") + ", 0)")
            + " AS score FROM dmain LEFT JOIN dpf2 ON dmain.doc_id = dpf2.doc_id"
        ),
    )

    # ---- eDisMax "+HOT MID -RARE": required + optional-add + excluded
    o["ft_edismax_ops"] = _with(
        [
            _term_cte("exa", HOT),
            _term_cte("exb", MID),
            _term_cte("exd", RARE),
        ],
        _topk_sql(
            "SELECT exa.doc_id AS doc_id, "
            + _R(_D("exa.score") + " + coalesce(" + _D("exb.score") + ", 0)")
            + " AS score FROM exa LEFT JOIN exb ON exa.doc_id = exb.doc_id "
            "WHERE exa.doc_id NOT IN (SELECT doc_id FROM exd)"
        ),
    )

    # ---- spellcheck collation: suggestion substitution + hit verification
    def _sc_opts(alias: str, w: str) -> str:
        return (
            f"{alias} AS (SELECT term, rn FROM (SELECT term, row_number() OVER ("
            f"ORDER BY levenshtein(term, '{w}') ASC, df DESC, term ASC) AS rn "
            f"FROM dfreq WHERE levenshtein(term, '{w}') <= 2 AND term <> '{w}') WHERE rn <= 3)"
        )

    o["ft_spell_collate"] = _with(
        [
            _sc_opts("sc1", "scann"),
            _sc_opts("sc2", "kei"),
            "scc AS (SELECT sc1.term AS t1, sc2.term AS t2, "
            "(sc1.rn - 1) * (SELECT count(*) FROM sc2) + sc2.rn AS try "
            "FROM sc1 CROSS JOIN sc2)",
            "scv AS (SELECT t1, t2, try, (SELECT count(*) FROM ("
            "SELECT doc_id FROM tf WHERE term = c.t1 INTERSECT "
            "SELECT doc_id FROM tf WHERE term = c.t2)) AS hits "
            "FROM scc c WHERE try <= 10)",
        ],
        "SELECT t1 || ' ' || t2 AS collation, CAST(hits AS BIGINT) AS hits "
        "FROM scv WHERE hits > 0 ORDER BY hits DESC, try ASC LIMIT 3",
    )

    # ---- percolation: (doc, query_id) membership pairs
    o["pc_percolate"] = _with(
        [phrase_cte],
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, query_id FROM ("
        f"  SELECT doc_id, 'term_hot' AS query_id FROM tf WHERE term = '{HOT}'"
        "  UNION ALL "
        f"  SELECT doc_id, 'mid_not_hot' FROM tf WHERE term = '{MID}'"
        f"    AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = '{HOT}')"
        "  UNION ALL "
        "  SELECT doc_id, 'phrase' FROM ph WHERE ptf > 0"
        ") ORDER BY doc_id, query_id",
    )

    # ---- UnifiedHighlighter PassageScorer over the single whole-text
    # passage (corpus texts are punctuation-free): per present query term
    # contrib = f32(tf_factor * weight); doc hl = f32(f32(Σ double) * norm(0))
    _hl_len_ratio = _R("CAST(h.clen AS REAL) / CAST(87.0 AS REAL)")
    _hl_numdocs = _R("CAST(1 AS REAL) + " + _hl_len_ratio)
    _hl_weight = _R(
        "CAST(2.2 AS REAL) * "
        + _R(f"ln(1 + ({_D(_hl_numdocs)} + 0.5) / (t.tf + 0.5))")
    )
    _hl_tfnorm = _R(
        "CAST(1.2 AS REAL) * "
        + _R(_R("0.25") + " + " + _R(_R("0.75") + " * " + _hl_len_ratio))
    )
    _hl_tff = _R(f"CAST(t.tf AS REAL) / (CAST(t.tf AS REAL) + {_hl_tfnorm})")
    _hl_norm0 = _R("1 + " + _R("1 / " + _R("ln(CAST(87.0 AS REAL) + 0)")))
    o["ft_unified_highlight"] = _with(
        [
            "hpl AS (SELECT d.doc_id AS doc_id, length(d.text) AS clen FROM documents d "
            f"WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = '{HOT}'))",
            f"hc AS (SELECT t.doc_id AS doc_id, {_R(_hl_tff + ' * ' + _hl_weight)} AS c "
            f"FROM tf t JOIN hpl h ON t.doc_id = h.doc_id WHERE t.term IN ('{HOT}', '{MID}'))",
            "hsum AS (SELECT doc_id, "
            + _R("sum(" + _D("c") + ")")
            + " AS s FROM hc GROUP BY doc_id)",
            f"hfin AS (SELECT doc_id, {_R('hsum.s * ' + _hl_norm0)} AS score FROM hsum)",
        ],
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        "CAST(doc_id AS BIGINT) AS doc_id FROM hfin ORDER BY score DESC, doc_id ASC LIMIT 10",
    )

    # ---- SimpleQueryParser "scan | key + dup" = +(scan OR key) +dup:
    # inner SHOULD group f32-rounds at its node boundary, outer MUST sums
    o["ft_simple_parse"] = _with(
        [
            _term_cte("spa", HOT),
            _term_cte("spb", MID),
            _term_cte("spd", RARE),
            "spin AS (SELECT doc_id, "
            + _R("sum(" + _D("score") + ")")
            + " AS score FROM (SELECT * FROM spa UNION ALL SELECT * FROM spb) GROUP BY doc_id)",
        ],
        _topk_sql(
            "SELECT i.doc_id AS doc_id, "
            + _R(_D("i.score") + " + " + _D("spd.score"))
            + " AS score FROM spin i JOIN spd ON i.doc_id = spd.doc_id"
        ),
    )

    # ---- payload queries (queries/payloads): payload = pos & 7 per
    # occurrence. Position enumeration via per-doc token ordinals.
    _occ = (
        "occ AS (SELECT doc_id, ord - 1 AS pos, toks[ord] AS term "
        "FROM (SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS ord "
        "FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
        "FROM documents)))"
    )
    # AveragePayloadFunction: payloadScore = f32 sum of (float) payloads
    # (small ints — exact), docScore = f32(payloadScore / n); final =
    # f32(spanScore * payloadScore) with spanScore = the BM25 term score
    _pay_avg = _R(f"CAST(pf.psum AS REAL) / CAST(pf.n AS REAL)")
    o["ft_payload_score"] = _with(
        [
            _term_cte("sa", HOT),
            _occ,
            f"pf AS (SELECT doc_id, count(*) AS n, sum(pos & 7) AS psum FROM occ "
            f"WHERE term = '{HOT}' GROUP BY doc_id)",
        ],
        _topk_sql(
            f"SELECT sa.doc_id AS doc_id, {_R(f'sa.score * {_pay_avg}')} AS score "
            "FROM sa JOIN pf ON sa.doc_id = pf.doc_id"
        ),
    )

    # SpanPayloadCheckQuery: freq = count of occurrences with payload == 3;
    # term statistics stay the unfiltered term's (SpanWeight binds TermStates
    # before payload filtering)
    _pc_t32 = _R(f"acc.atf / (acc.atf + {_D(_CACHE)})")
    _pc_score = _R(f"{_idf(f_pc_df := f'(SELECT df FROM dfreq WHERE term = {MID!r})')} * {_pc_t32}")
    o["ft_payload_check"] = _with(
        [
            _occ,
            f"acc AS (SELECT doc_id, count(*) AS atf FROM occ "
            f"WHERE term = '{MID}' AND (pos & 7) = 3 GROUP BY doc_id)",
        ],
        _topk_sql(
            f"SELECT acc.doc_id AS doc_id, {_pc_score} AS score "
            "FROM acc JOIN dlq ON acc.doc_id = dlq.doc_id"
        ),
    )

    # TermAutomatonQuery "hash join" | "sort merge join": freq = accepted
    # consecutive-position substring count (a 2-gram + a 3-gram path);
    # weight = f32 of the double-accumulated per-term f32 idfs of the four
    # distinct automaton terms (BM25Similarity.idfExplain[] semantics)
    _ta_idf = _R(
        " + ".join(
            _D(_idf(f"(SELECT df FROM dfreq WHERE term = '{t}')"))
            for t in ("hash", "join", "merge", "sort")
        )
    )
    _ta_t32 = _R(f"fr.freq / (fr.freq + {_D(_CACHE)})")
    o["ft_term_automaton"] = _with(
        [
            _occ,
            "p2 AS (SELECT a.doc_id, count(*) AS c FROM occ a "
            "JOIN occ b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            "WHERE a.term = 'hash' AND b.term = 'join' GROUP BY a.doc_id)",
            "p3 AS (SELECT a.doc_id, count(*) AS c FROM occ a "
            "JOIN occ b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            "JOIN occ c3 ON a.doc_id = c3.doc_id AND c3.pos = a.pos + 2 "
            "WHERE a.term = 'sort' AND b.term = 'merge' AND c3.term = 'join' "
            "GROUP BY a.doc_id)",
            "fr AS (SELECT doc_id, sum(c) AS freq FROM (SELECT * FROM p2 UNION ALL SELECT * FROM p3) GROUP BY doc_id)",
        ],
        _topk_sql(
            f"SELECT fr.doc_id AS doc_id, {_R(f'{_ta_idf} * {_ta_t32}')} AS score "
            "FROM fr JOIN dlq ON fr.doc_id = dlq.doc_id"
        ),
    )

    # nearest-neighbor: same double haversine program over quantized coords,
    # distance asc + id asc
    o["geo_nearest"] = (
        f"WITH {_geo_pts}, {_geo_q} "
        f"SELECT CAST(c_custkey AS BIGINT) AS c_custkey, CAST(floor({_hav}) AS BIGINT) AS dist_m "
        f"FROM q ORDER BY {_hav} ASC, c_custkey ASC LIMIT 15"
    )

    o["ft_docvalues_terms"] = (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents "
        "WHERE lang IN ('de', 'fr') ORDER BY doc_id"
    )
    o["ft_docvalues_numbers"] = (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents "
        "WHERE n_chars IN (132, 218, 246) ORDER BY doc_id"
    )

    # QualityBenchmark: five single-term topics, judgments = tf >= 2,
    # exact-integer AvP numerator (2520 = lcm(1..10))
    _qb_topics = (HOT, HOT2, MID, MID2, RARE)
    _qb_ctes = []
    _qb_unions = []
    for _i, _t in enumerate(_qb_topics):
        _qb_ctes.append(_term_cte(f"qb{_i}", _t))
        _qb_unions.append(
            f"SELECT '{_t}' AS topic, rank, doc_id FROM "
            f"({_topk_sql(f'SELECT doc_id, score FROM qb{_i}')})"
        )
    _qb_ctes.append("allr AS (" + " UNION ALL ".join(_qb_unions) + ")")
    _qb_ctes.append(
        "rel AS ("
        + " UNION ALL ".join(
            f"SELECT '{_t}' AS topic, doc_id FROM tf WHERE term = '{_t}' AND tf >= 2"
            for _t in _qb_topics
        )
        + ")"
    )
    _qb_ctes.append(
        "jj AS (SELECT a.topic, a.rank, "
        "CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel "
        "FROM allr a LEFT JOIN rel r ON a.topic = r.topic AND a.doc_id = r.doc_id)"
    )
    _qb_ctes.append(
        "cc AS (SELECT topic, rank, rel, "
        "sum(rel) OVER (PARTITION BY topic ORDER BY rank) AS cum FROM jj)"
    )
    _qb_ctes.append("mg AS (SELECT topic, count(*) AS max_good FROM rel GROUP BY topic)")
    o["qb_quality"] = _with(
        _qb_ctes,
        "SELECT t.topic AS topic, CAST(coalesce(mg.max_good, 0) AS BIGINT) AS max_good, "
        "CAST(coalesce(t.g10, 0) AS INT) AS good_at_10, "
        "CAST(coalesce(t.fr, 0) AS INT) AS first_rel, "
        "CAST(coalesce(t.ap_num, 0) AS BIGINT) AS ap_num "
        "FROM (SELECT topic, max(CASE WHEN rank = 10 THEN cum END) AS g10, "
        "sum(CASE WHEN rel = 1 THEN cum * (2520 // rank) ELSE 0 END) AS ap_num, "
        "min(CASE WHEN rel = 1 THEN rank END) AS fr FROM cc GROUP BY topic) t "
        "LEFT JOIN mg ON t.topic = mg.topic ORDER BY topic",
    )

    # suggesters: term-dictionary completion weighted by df; fuzzy allows one
    # edit in some prefix of the key anchored on the first char; blended
    # infix runs over word-bigram entries with POSITION_LINEAR coefficients
    o["ft_analyzing_suggest"] = _with(
        [],
        "SELECT term AS surface, CAST(df AS BIGINT) AS weight FROM dfreq "
        "WHERE term LIKE 's%' ORDER BY df DESC, term ASC LIMIT 8",
    )
    o["ft_fuzzy_suggest"] = _with(
        [],
        "SELECT term AS surface, CAST(df AS BIGINT) AS weight FROM dfreq "
        "WHERE term LIKE 'scam%' OR (substr(term, 1, 1) = 's' AND ("
        "levenshtein(substr(term, 1, 3), 'scam') <= 1 OR "
        "levenshtein(substr(term, 1, 4), 'scam') <= 1 OR "
        "levenshtein(substr(term, 1, 5), 'scam') <= 1)) "
        "ORDER BY df DESC, term ASC LIMIT 8",
    )
    o["ft_blended_suggest"] = _with(
        [
            _occ,
            "bg AS (SELECT a.term || ' ' || b.term AS key, count(*) AS weight "
            "FROM occ a JOIN occ b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 GROUP BY 1)",
            "cand AS (SELECT key, weight, "
            "CASE WHEN split_part(key, ' ', 1) LIKE 'data%' THEN 0 "
            "WHEN split_part(key, ' ', 2) LIKE 'data%' THEN 1 ELSE -1 END AS pos FROM bg)",
            "sel AS (SELECT * FROM cand WHERE pos >= 0 ORDER BY weight DESC, key ASC LIMIT 80)",
            "bl AS (SELECT key, "
            "CASE WHEN CAST(CASE WHEN weight = 0 THEN 1 ELSE weight END AS DOUBLE) < 10 "
            "AND CAST(CASE WHEN weight = 0 THEN 1 ELSE weight END AS DOUBLE) > -10 "
            "THEN CAST(CASE WHEN weight = 0 THEN 1 ELSE weight END AS DOUBLE) * 10 "
            "ELSE CAST(CASE WHEN weight = 0 THEN 1 ELSE weight END AS DOUBLE) END AS w, "
            "CASE WHEN key LIKE 'data%' THEN 1.0 ELSE 1.0 - 0.10 * pos END AS coef FROM sel)",
        ],
        "SELECT key AS surface, CAST(trunc(w * coef) AS BIGINT) AS score FROM bl "
        "ORDER BY score DESC, surface ASC LIMIT 8",
    )

    # expressions module: the identical double program (rational ops only),
    # float32 only at the collector boundary
    o["ft_expression"] = _with(
        [_term_cte("sa", HOT)],
        _topk_sql(
            "SELECT sa.doc_id AS doc_id, "
            "CAST(CAST(sa.score AS DOUBLE) * (CASE WHEN d.n_chars >= 200 THEN 1.5 ELSE 1.0 END) "
            "+ CAST(d.n_chars % 7 AS DOUBLE) / 10 AS REAL) AS score "
            "FROM sa JOIN documents d ON sa.doc_id = d.doc_id"
        ),
    )

    # ---- index-maintenance lifecycle --------------------------------------
    # deletes: hits filtered out, but stats still computed over ALL docs
    # (pre-merge live-docs semantics) — so the standard CTEs apply unchanged
    _DEL = "del AS (SELECT DISTINCT doc_id FROM tf WHERE term = '" + RARE + "')"
    deletes_body = (
        f"SELECT doc_id, {dsum} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) "
        "WHERE doc_id NOT IN (SELECT doc_id FROM del) GROUP BY doc_id"
    )
    o["ft_deletes_topk"] = _with(
        [_term_cte("sa", HOT), _term_cte("sb", MID), _DEL], _topk_sql(deletes_body)
    )

    # expunge: stats (n, avgdl, df) rebuilt over the SURVIVING corpus only —
    # the whole base-CTE block re-derives from docs2
    def _base_over_docs2(prefix_ctes: str) -> str:
        return (
            "WITH "
            + prefix_ctes
            + ",\n"
            + _BASE.strip().replace("FROM documents", "FROM docs2")
        )

    _EXPUNGE_PREFIX = (
        "tok0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
        "AS term FROM documents),\n"
        f"del AS (SELECT DISTINCT doc_id FROM tok0 WHERE term = '{RARE}'),\n"
        "docs2 AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM del))"
    )
    o["ft_expunge_topk"] = (
        _base_over_docs2(_EXPUNGE_PREFIX)
        + ",\n"
        + _term_cte("sc", HOT)
        + "\n"
        + _topk_sql("SELECT doc_id, score FROM sc")
    )

    # forceMerge(1): result-identical to the unmerged index; n_runs == 1
    # pins that the runs actually collapsed
    merged_body = (
        f"SELECT doc_id, {dsum} AS score "
        "FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb) GROUP BY doc_id"
    )
    o["ft_merged_topk"] = _with(
        [_term_cte("sa", HOT2), _term_cte("sb", MID2)],
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"CAST(doc_id AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS n_runs FROM ({merged_body}) "
        "ORDER BY score DESC, doc_id ASC LIMIT 10",
    )

    # TieredMergePolicy cascade: independent recursive-SQL replay of the
    # ENTIRE policy loop (TieredMergePolicy.java:380-401 floored tier
    # budget; :566-623 skew scoring skew = floored(largest)/flooredTot *
    # tot^0.05 over consecutive windows of the size-desc run list, first
    # minimal window wins) against the engine's maybe_merge(size_by=
    # 'postings') — run sizes are postings counts, derivable from tf;
    # boundaries replay the query's geometric halving; new run ids replay
    # next_id = maxrid + 1e9 + round.  Search scores are merge-invariant,
    # so the rank block reuses merged_body's global-stats scoring.
    _cascade_ctes = """
nn AS (SELECT count(*) AS n FROM documents),
bnd(k, lo) AS (
  SELECT 0, 0
  UNION ALL
  SELECT k + 1, lo + greatest(1, ((SELECT n FROM nn) - lo) // 2)
  FROM bnd WHERE k < 11 AND (SELECT n FROM nn) - lo > 3
),
psz AS (SELECT part, count(*) AS s FROM
        (SELECT (SELECT count(*) FROM bnd b WHERE b.k > 0 AND b.lo <= t.doc_id) AS part FROM tf t)
        GROUP BY part),
consts AS (SELECT greatest(1, (SELECT sum(s) FROM psz) // 16) AS flr,
                  (SELECT max(part) FROM psz) AS maxrid),
cinit AS (SELECT list(struct_pack(s := CAST(s AS BIGINT), rid := CAST(part AS BIGINT)) ORDER BY part) AS st
          FROM psz),
casc(rnd, st, done) AS (
  SELECT 0, (SELECT st FROM cinit), FALSE
  UNION ALL
  SELECT rnd + 1,
         CASE WHEN stop THEN st ELSE
           list_append(
             list_filter(st, x -> NOT list_contains(win_rids, x.rid)),
             struct_pack(s := win_sum, rid := maxrid + 1000000000 + rnd))
         END,
         stop
  FROM (
    SELECT rnd, st, flr, maxrid,
           len(st) <= alw AS stop,
           list_transform(list_slice(elig, best_st, best_st + 3), x -> x.rid) AS win_rids,
           list_sum(list_transform(list_slice(elig, best_st, best_st + 3), x -> x.s)) AS win_sum
    FROM (
      SELECT rnd, st, alw, elig, flr, maxrid,
             CAST(list_reduce(
               list_filter(
                 list_transform(range(1, len(elig) + 1), st_i -> struct_pack(
                   sc := CAST(greatest(list_extract(elig, CAST(st_i AS INT)).s, flr) AS DOUBLE)
                         / list_sum(list_transform(list_slice(elig, st_i, st_i + 3),
                                                   x -> CAST(greatest(x.s, flr) AS DOUBLE)))
                         * pow(CAST(list_sum(list_transform(list_slice(elig, st_i, st_i + 3),
                                                            x -> CAST(x.s AS DOUBLE))) AS DOUBLE), 0.05),
                   st_i := st_i)),
                 w -> len(st) - w.st_i + 1 >= 2),
               (a, b) -> CASE WHEN b.sc < a.sc OR (b.sc = a.sc AND b.st_i < a.st_i) THEN b ELSE a END
             ).st_i AS BIGINT) AS best_st
      FROM (
        SELECT rnd, st, flr, maxrid,
               CAST(list_reduce(
                 list_prepend(struct_pack(
                     t := CAST(list_sum(list_transform(st, x -> greatest(x.s, flr))) AS DOUBLE),
                     l := CAST(flr AS DOUBLE), a := CAST(0 AS DOUBLE), fin := FALSE),
                   list_transform(range(1, 30), i -> struct_pack(
                     t := CAST(0 AS DOUBLE), l := CAST(0 AS DOUBLE), a := CAST(0 AS DOUBLE), fin := FALSE))),
                 (acc, ign) -> CASE
                    WHEN acc.fin THEN acc
                    WHEN acc.t / acc.l < 2.0
                      THEN struct_pack(t := acc.t, l := acc.l, a := acc.a + ceil(acc.t / acc.l), fin := TRUE)
                    ELSE struct_pack(t := acc.t - 2.0 * acc.l, l := acc.l * 4, a := acc.a + 2.0, fin := FALSE)
                 END).a AS BIGINT) AS alw,
               list_transform(
                 list_sort(list_transform(st, x -> struct_pack(negs := -x.s, rid := x.rid))),
                 y -> struct_pack(s := -y.negs, rid := y.rid)) AS elig
        FROM casc CROSS JOIN consts WHERE NOT done AND rnd < 20
      )
    )
  )
),
cfinal AS (SELECT st FROM casc ORDER BY rnd DESC LIMIT 1),
cman AS (
  SELECT CAST(len(st) AS BIGINT) AS n_runs,
         array_to_string(list_transform(
           list_transform(list_sort(list_transform(st, x -> struct_pack(negs := -x.s, rid := x.rid))),
                          y -> -y.negs), z -> CAST(z AS VARCHAR)), ',') AS sizes
  FROM cfinal)
"""
    o["ft_tiered_cascade_topk"] = (
        "WITH RECURSIVE "
        + _BASE.strip().rstrip(",")
        + ",\n"
        + _term_cte("sa", HOT2)
        + ",\n"
        + _term_cte("sb", MID2)
        + ",\n"
        + _cascade_ctes.strip().rstrip(",")
        + "\n"
        + "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, "
        f"CAST(doc_id AS BIGINT) AS doc_id, n_runs, sizes FROM ({merged_body}) CROSS JOIN cman "
        "ORDER BY score DESC, doc_id ASC LIMIT 10"
    )

    # shard 0 searched standalone: every statistic local to doc_id < N/2
    _SHARD_PREFIX = (
        "docs2 AS (SELECT * FROM documents "
        "WHERE doc_id < (SELECT count(*) // 2 FROM documents))"
    )
    o["ft_shard_local_topk"] = (
        _base_over_docs2(_SHARD_PREFIX)
        + ",\n"
        + _term_cte("sc", MID)
        + "\n"
        + _topk_sql("SELECT doc_id, score FROM sc")
    )

    # replica search is bit-identical to the source index
    o["ft_replica_topk"] = _with(
        [_term_cte("sa", HOT), _term_cte("sb", RARE)], _topk_sql(or_body)
    )

    # versioned updates: highest version wins, ties to the update
    o["ing_versioned"] = """
WITH base AS (SELECT doc_id, 'base' AS src, n_chars AS version, 0 AS is_u FROM documents),
upd AS (SELECT doc_id, 'update' AS src,
        n_chars + (CASE WHEN doc_id % 15 = 0 THEN 7 WHEN doc_id % 10 = 0 THEN 0 ELSE -3 END) AS version,
        1 AS is_u
        FROM documents WHERE doc_id % 5 = 0),
r AS (SELECT doc_id, src, version,
      row_number() OVER (PARTITION BY doc_id ORDER BY version DESC, is_u DESC) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
SELECT CAST(doc_id AS BIGINT) AS doc_id, src, CAST(version AS BIGINT) AS version
FROM r WHERE rn = 1 ORDER BY doc_id
"""
    return o
