"""Query AST — the analog of the reference's ``org.apache.lucene.search.Query``
class hierarchy, as plain dataclasses.

Covered query types and their reference semantics:

- :class:`TermQuery` — ``reference lucene/core/src/java/org/apache/lucene/
  search/TermQuery.java:107-115`` (single term, BM25-scored);
- :class:`BooleanQuery` — ``search/BooleanQuery.java`` with MUST / SHOULD /
  FILTER / MUST_NOT occurs and ``minimumNumberShouldMatch``; scores of all
  matching scoring clauses are summed; when MUST/FILTER clauses exist,
  SHOULD becomes optional (pure boost) unless minimumNumberShouldMatch > 0;
- :class:`PhraseQuery` — ``search/PhraseQuery.java`` exact phrase; evaluated
  two-phase (approximate AND + exact verify), see searcher;
- :class:`SynonymQuery` — ``search/SynonymQuery.java:54`` (union of terms
  scored as a single pseudo-term: blended df = max of dfs, tf summed);
- :class:`PrefixQuery` — ``search/PrefixQuery.java`` via term-dictionary
  expansion with CONSTANT_SCORE_REWRITE (``MultiTermQuery.java:68,94``);
- :class:`DisjunctionMaxQuery` — ``search/DisjunctionMaxQuery.java``
  (max + tieBreaker * (sum - max));
- :class:`BoostQuery` / :class:`ConstantScoreQuery` /
  :class:`MatchAllQuery` / :class:`MatchNoDocsQuery` — trivial wrappers.
"""

from __future__ import annotations

from dataclasses import dataclass


class Query:
    """Marker base class."""

    def terms(self) -> set[str]:
        """All index terms this query touches (for stats resolution)."""
        return set()


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0

    def terms(self):
        return {self.term}


@dataclass(frozen=True)
class PhraseQuery(Query):
    phrase_terms: tuple
    slop: int = 0
    boost: float = 1.0

    def terms(self):
        return set(self.phrase_terms)


@dataclass(frozen=True)
class SynonymQuery(Query):
    synonyms: tuple
    boost: float = 1.0

    def terms(self):
        return set(self.synonyms)


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    boost: float = 1.0
    # CONSTANT_SCORE_REWRITE: matching docs all score boost * 1.0


@dataclass(frozen=True)
class WildcardQuery(Query):
    """``search/WildcardQuery.java``: `*` = any run, `?` = one char; matches
    the whole term (anchored). CONSTANT_SCORE_REWRITE like all MultiTermQuery
    (``MultiTermQuery.java:68,94``)."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery(Query):
    """``search/RegexpQuery.java``: regex anchored to the full term."""

    regex: str
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """``search/TermRangeQuery.java``: lexicographic term range."""

    lower: str = None
    upper: str = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """``search/TermInSetQuery.java``: docs containing any of the terms,
    constant-score."""

    in_terms: tuple = ()
    boost: float = 1.0


@dataclass(frozen=True)
class FieldTermQuery(Query):
    """Keyword-field exact match — the ``StringField`` + ``TermQuery`` pair
    (``document/StringField.java``; the Solr example shape
    ``role:assistant``).

    Spark-first: keyword fields are ordinary DataFrame columns (SURVEY §1.2),
    so this evaluates as a Catalyst predicate pushed into the corpus scan —
    the ``IndexOrDocValuesQuery`` column-scan arm
    (``search/IndexOrDocValuesQuery.java``) chosen statically. Constant-score
    (the dominant reference usage: Solr ``fq`` / FILTER clauses); not
    analyzed, like StringField."""

    field: str
    value: str
    boost: float = 1.0


@dataclass(frozen=True)
class FieldInSetQuery(Query):
    """Set membership on a doc-values column — ``DocValuesTermsQuery`` /
    ``DocValuesNumbersQuery`` (``reference lucene/sandbox/.../search/
    DocValuesTermsQuery.java``, ``DocValuesNumbersQuery.java``): match docs
    whose SORTED/NUMERIC doc-values value is in the set, constant score.

    Spark-first: doc values are ordinary columns (SURVEY §1.2), so this is a
    Catalyst ``IN`` predicate pushed into the corpus scan — the column-scan
    arm ``IndexOrDocValuesQuery`` would pick for low-selectivity filters."""

    field: str
    values: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class FieldRangeQuery(Query):
    """Numeric/term range on a typed column — ``PointRangeQuery``
    (``search/PointRangeQuery.java``, BKD tree) re-expressed as a Catalyst
    range predicate with parquet min/max pruning. Constant-score."""

    field: str
    lower: object = None
    upper: object = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """``search/FuzzyQuery.java``: terms within `max_edits` of `term`.

    Scored via the reference's default TopTermsBlendedFreqScoringRewrite
    (``FuzzyQuery.java:100``, ``MultiTermQuery.java:188-224``,
    ``BlendedTermQuery.java:133,275-284``): top `max_expansions` terms by
    (boost desc, term asc), per-term boost 1 − ed/min(|t|,|q|) in float32
    (``FuzzyTermsEnum.java:230-237``), every term scored against the blended
    df = max(df) / ttf = Σttf, SHOULD-summed.  Wrapping in ConstantScoreQuery
    restores CONSTANT_SCORE_REWRITE.

    ``transpositions=True`` counts a transposition as one edit (optimal
    string alignment — Lucene's ``LevenshteinAutomata`` with transpositions,
    the reference default ``FuzzyQuery.defaultTranspositions``); the exact OSA
    distance is computed driver-side over a levenshtein ≤ 2·max_edits
    term-dictionary pre-filter (OSA ≥ lev/2).  ``transpositions=False`` uses
    plain Levenshtein end-to-end (Spark/DuckDB ``levenshtein``) and is this
    engine's default so SQL oracles can replay the expansion."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    max_expansions: int = 50
    transpositions: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """``search/MultiPhraseQuery.java``: a phrase where each position slot
    admits several alternative terms (synonym-expanded phrases).

    Matches when some alternative of every slot occurs at consecutive
    positions; phrase tf = number of matching start positions (union
    postings per slot fed to the exact matcher, ``MultiPhraseQuery.java:
    245-258`` UnionPostingsEnum). Scored like PhraseQuery with idf summed
    over ALL terms of ALL slots that exist in the index
    (``MultiPhraseQuery.java:212-238`` collects allTermStats →
    ``BM25Similarity.idfExplain(termStats[])`` sums float32 idfs in a
    double, casts back to float32)."""

    slots: tuple  # tuple of tuples: one tuple of alternative terms per slot
    boost: float = 1.0
    # Builder.add(Term[], position) explicit slot positions (``MultiPhrase
    # Query.java:99-118``); () = consecutive 0..n-1.  Gaps mean slot k must
    # match at start + positions[k].
    positions: tuple = ()
    # setSlop (``MultiPhraseQuery.java:76-82``): slop > 0 routes through the
    # union-postings sloppy matcher (SloppyPhraseMatcher over one
    # PhrasePositions stream per slot); negative rejected like the reference.
    slop: int = 0

    def __post_init__(self):
        if self.slop < 0:
            raise ValueError(f"negative slop: {self.slop}")
        if self.positions and len(self.positions) != len(self.slots):
            raise ValueError("positions must align 1:1 with slots")

    def slot_positions(self) -> tuple:
        return self.positions or tuple(range(len(self.slots)))

    def terms(self):
        return {t for slot in self.slots for t in slot}


@dataclass(frozen=True)
class TermAutomatonQuery(Query):
    """``sandbox/.../search/TermAutomatonQuery.java``: a token automaton over
    index positions.  States are ints (0 = initial); ``transitions`` are
    ``(src_state, term, dst_state)`` arcs; ``accepts`` is the accepting-state
    set.  A document matches where some path of CONSECUTIVE positions spells a
    string the automaton accepts; ``freq`` counts every (start position,
    accepting prefix) pair — exactly the reference scorer's per-arrival
    accept counting (``TermAutomatonScorer.java:305-327``, note
    ``PosState.add`` keeps duplicates, ``:380-385``).

    Scoring: BM25 over that freq with idf summed across the automaton's
    distinct present terms (``TermAutomatonWeight`` passes every
    ``idToTerm`` entry's TermStatistics to ``similarity.scorer``,
    ``TermAutomatonQuery.java:346-361``; multi-stats BM25 idf is the
    float32 per-term idf sum accumulated in double,
    ``BM25Similarity.java:172-181``).

    ``addAnyTransition`` (the ANY arc) is not supported — the primary
    public construction path, ``TokenStreamToTermAutomatonQuery`` (graph
    token streams / multi-token synonyms), never emits one.
    """

    n_states: int
    transitions: tuple  # of (src_state:int, term:str, dst_state:int)
    accepts: frozenset
    boost: float = 1.0

    @staticmethod
    def from_phrases(*phrases: tuple) -> "TermAutomatonQuery":
        """Build the union-of-token-paths automaton
        (``TokenStreamToTermAutomatonQuery`` over a graph token stream whose
        alternatives are the given phrases)."""
        transitions = []
        n_states = 1
        accepts = set()
        for phrase in phrases:
            src = 0
            for i, term in enumerate(phrase):
                dst = n_states
                n_states += 1
                transitions.append((src, term, dst))
                src = dst
            accepts.add(src)
        return TermAutomatonQuery(n_states, tuple(transitions), frozenset(accepts))

    def terms(self):
        return {t for _, t, _ in self.transitions}


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """``search/spans/SpanNearQuery.java``: sub-spans (here: single terms)
    within ``slop`` positions of each other, optionally in order.

    Match semantics (ordered): positions ``p_0 < p_1 < ... < p_{n-1}`` of the
    clause terms with total gap ``p_{n-1} - p_0 - (n-1) <= slop`` (the sum of
    the inter-span gaps — ``NearSpansOrdered.java`` width accounting).
    Unordered is supported for two clauses: ``|p_a - p_b| - 1 <= slop``
    (``NearSpansUnordered.java`` minimal-window semantics for two unit-width
    spans).

    Deviation from the reference: evaluated with CONSTANT_SCORE semantics
    (the reference scores spans via ``sloppyFreq`` over span widths); the
    matching doc set is identical.

    A clause may also be a tuple of terms — a nested single-term
    ``SpanOrQuery`` (``search/spans/SpanOrQuery.java``): that slot matches
    at any occurrence of any of its alternatives — or a nested
    ``SpanNearQuery`` (the surround parser's ``a W b W c`` left-associative
    nesting): that slot matches at every (start, end) span of the inner
    near query.
    """

    span_terms: tuple
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0

    def terms(self):
        out = set()
        for c in self.span_terms:
            # _span_clause_terms recurses into tuples whose elements are
            # themselves span clauses (an inline SpanOr over clauses), so
            # Query objects never leak into the term set
            out |= _span_clause_terms(c)
        return out


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """``search/spans/SpanFirstQuery.java``: spans ending within the first
    ``end`` positions of the document — ``match.end() <= end``; a single-term
    span at 0-based position p has end p+1, so p <= end-1. Constant score
    (same documented deviation as SpanNearQuery)."""

    term: str
    end: int
    boost: float = 1.0

    def terms(self):
        return _span_clause_terms(self.term)


@dataclass(frozen=True)
class SpanPositionRangeQuery(Query):
    """``search/spans/SpanPositionRangeQuery.java``: spans accepted when
    ``start <= match.start()`` and ``match.end() <= end`` (acceptPosition).
    SpanFirstQuery is the ``start=0`` special case.  Constant score (same
    documented deviation as the other span queries)."""

    term: str
    start: int
    end: int
    boost: float = 1.0

    def terms(self):
        return _span_clause_terms(self.term)


@dataclass(frozen=True)
class SpanMultiTermWrapper(Query):
    """``search/spans/SpanMultiTermQueryWrapper.java``: lets a MultiTermQuery
    (prefix/wildcard/regexp/range/fuzzy) stand where a span clause is
    expected.  The default SpanRewriteMethod expands the term dictionary into
    a SpanOr over the matching terms (``SpanMultiTermQueryWrapper.java``
    WRAPPED rewrite); our searcher performs the same expansion against the
    terms table in ``IndexSearcher._rewrite_span_multiterm`` — standalone it
    becomes a SpanOrQuery, inside a SpanNearQuery clause it becomes the
    inline alternatives tuple."""

    query: Query = None

    def terms(self):
        return set()  # unknown until the dictionary expansion rewrite


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """``search/spans/SpanOrQuery.java``: the union of the clause span
    streams.  Clauses may be terms or ANY span clause (SpanNearQuery,
    SpanFirst/PositionRange, nested SpanNot/SpanOr) — standalone it matches
    any document with a span from any clause, and it nests as a clause of
    SpanNearQuery/SpanNotQuery (an all-term SpanOr inside a near may also
    be written inline as a tuple of terms).  Constant score."""

    span_terms: tuple
    boost: float = 1.0

    def terms(self):
        out: set = set()
        for c in self.span_terms:
            out |= _span_clause_terms(c)
        return out


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """``search/spans/SpanNotQuery.java``: include spans that do not overlap
    any exclude span expanded by ``pre`` positions before and ``post`` after
    (``SpanNotQuery.java:147-187`` accept: candidate [cs, ce) rejected iff
    some exclude [xs, xe) has ``xe > cs - pre`` and ``xs < ce + post``;
    negative windows permit that much overlap).  ``include_term`` /
    ``exclude_term`` accept ANY span clause — a term, a tuple of terms
    (inline SpanOr), a SpanNearQuery, SpanFirst/PositionRange, or a nested
    SpanNotQuery — matching the reference's composability.  For single-term
    spans the window reduces to ``p - pre <= x <= p + post``.  Constant
    score."""

    include_term: object
    exclude_term: object
    pre: int = 0
    post: int = 0
    boost: float = 1.0

    def terms(self):
        return _span_clause_terms(self.include_term) | _span_clause_terms(self.exclude_term)


@dataclass(frozen=True)
class SpanContainingQuery(Query):
    """``search/spans/SpanContainingQuery.java``: spans of ``big`` that
    contain (start <= little.start and end >= little.end) a span of
    ``little``.  ``big``/``little`` are each a term, a tuple of terms (inline
    SpanOr), or an ordered single-term SpanNearQuery.

    Constant-score deviation as with the other span queries; note that as a
    *document* predicate Containing and Within are the same set (a doc has a
    big span containing a little span iff it has a little span within a big
    span) — the queries differ in which spans they *emit*, which matters only
    for span composition and span scoring, neither of which is score-visible
    here."""

    big: object
    little: object
    boost: float = 1.0

    def terms(self):
        return _span_clause_terms(self.big) | _span_clause_terms(self.little)


@dataclass(frozen=True)
class SpanWithinQuery(Query):
    """``search/spans/SpanWithinQuery.java``: spans of ``little`` that fall
    within (big.start <= little.start and little.end <= big.end) a span of
    ``big``.  Same constant-score document semantics as SpanContainingQuery
    (see its docstring)."""

    big: object
    little: object
    boost: float = 1.0

    def terms(self):
        return _span_clause_terms(self.big) | _span_clause_terms(self.little)


def _span_clause_terms(clause) -> set:
    """All index terms under a span clause.  A tuple is an inline SpanOr
    whose elements may themselves be span clauses (searcher._span_enum
    supports mixed tuples), so recurse element-wise — a flat ``set(clause)``
    would leak Query objects into the term set."""
    if isinstance(clause, str):
        return {clause}
    if isinstance(clause, tuple):
        out: set = set()
        for c in clause:
            out |= _span_clause_terms(c)
        return out
    return clause.terms()


@dataclass(frozen=True)
class MatchAllQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query = None
    boost: float = 1.0

    def terms(self):
        return self.query.terms()


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query = None
    boost: float = 1.0

    def terms(self):
        return self.query.terms()


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    disjuncts: tuple = ()
    tie_breaker: float = 0.0

    def terms(self):
        out = set()
        for q in self.disjuncts:
            out |= q.terms()
        return out


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """BlendedTermQuery (reference ``lucene/core/src/java/org/apache/lucene/
    search/BlendedTermQuery.java``): scores several terms as if they had the
    SAME index statistics — df = max(docFreq) and ttf = Σ totalTermFreq over
    the terms (:274-284 ``adjustFrequencies``) — then combines per-term
    scores with DisjunctionMax(tie=0.01) by default (:183
    ``DISJUNCTION_MAX_REWRITE``) or a SHOULD-sum (:133 ``BOOLEAN_REWRITE``).
    Used to query the same text across synonymous surface forms without the
    rare form dominating via its inflated idf."""

    blend_terms: tuple = ()
    term_boosts: tuple = ()  # per-term boosts, defaults to 1.0 each
    tie_breaker: float = 0.01
    rewrite: str = "dismax"  # "dismax" | "boolean"
    boost: float = 1.0

    def terms(self):
        return set(self.blend_terms)


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """CommonTermsQuery (reference ``lucene/queries/src/java/org/apache/
    lucene/queries/CommonTermsQuery.java``): terms whose docFreq exceeds
    ``max_term_frequency`` (a fraction of maxDoc, or an absolute count when
    >= 1) form an optional high-frequency group; the rest form the required
    low-frequency group, so stopword-like terms never drive matching.
    Rewritten against index stats at evaluation time (``rewrite`` /
    ``buildQuery``, CommonTermsQuery.java:120-209)."""

    query_terms: tuple = ()
    max_term_frequency: float = 0.01
    low_freq_occur: str = "SHOULD"  # MUST_NOT rejected, as in the reference
    high_freq_occur: str = "SHOULD"
    low_freq_min_should_match: float = 0.0
    high_freq_min_should_match: float = 0.0
    boost: float = 1.0

    def terms(self):
        return set(self.query_terms)


@dataclass(frozen=True)
class CoveringQuery(Query):
    """CoveringQuery (reference ``lucene/sandbox/src/java/org/apache/lucene/
    search/CoveringQuery.java``): matches documents where at least
    ``max(1, minimumNumberMatch(doc))`` of the sub-queries match; the score is
    the sum of the matching sub-queries' scores (CoveringScorer).  The
    per-document minimum comes from a LongValuesSource — here an ANSI-SQL
    expression over corpus columns (rows where it is NULL never match)."""

    queries: tuple = ()
    min_match_expr: str = "1"
    boost: float = 1.0

    def terms(self):
        out = set()
        for q in self.queries:
            out |= q.terms()
        return out


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: str  # 'MUST' | 'SHOULD' | 'MUST_NOT' | 'FILTER'


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple = ()
    minimum_should_match: int = 0

    @staticmethod
    def build(must=(), should=(), must_not=(), filter=(), minimum_should_match=0) -> "BooleanQuery":
        cl = (
            tuple(BooleanClause(q, "MUST") for q in must)
            + tuple(BooleanClause(q, "SHOULD") for q in should)
            + tuple(BooleanClause(q, "MUST_NOT") for q in must_not)
            + tuple(BooleanClause(q, "FILTER") for q in filter)
        )
        return BooleanQuery(clauses=cl, minimum_should_match=minimum_should_match)

    def by_occur(self, occur: str) -> list:
        return [c.query for c in self.clauses if c.occur == occur]

    def terms(self):
        out = set()
        for c in self.clauses:
            out |= c.query.terms()
        return out
