"""Percolation: match a stream of documents against registered queries.

Reference: ``lucene/memory/src/java/org/apache/lucene/memory/MemoryIndex.java
:178`` — the single-document in-memory index whose canonical use is
percolation (test each incoming document against stored queries).  The
term-based candidate pruning follows the lucene/monitor "presearcher"
pattern (upstream QueryTermFilter/TermFilteredPresearcher): every stored
query contributes trigger terms such that a document that matches the query
MUST contain one of them; documents only evaluate queries whose trigger set
intersects their token set.

Spark shape: the registered query set (id → Query tree) is a broadcast
variable; matching is ONE ``mapInPandas`` pass over the document stream —
no shuffle, no driver loop, works unchanged inside a Structured Streaming
``foreachBatch``.  Each Arrow batch analyzes a document once and evaluates
only the trigger-pruned candidates against its token map.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame

from ..plans.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def trigger_terms(q: Query) -> Optional[set]:
    """Terms such that any matching doc must contain at least one; ``None``
    means "cannot prune, always a candidate" (MatchAll, pure negation,
    multi-term expansions).  MUST/FILTER clauses allow picking the single
    cheapest trigger set; SHOULD unions; MUST_NOT contributes nothing."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, PhraseQuery):
        return {q.phrase_terms[0]}
    if isinstance(q, SynonymQuery):
        return set(q.synonyms)
    if isinstance(q, TermInSetQuery):
        return set(q.in_terms)
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return trigger_terms(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        out: set = set()
        for d in q.disjuncts:
            t = trigger_terms(d)
            if t is None:
                return None
            out |= t
        return out
    if isinstance(q, MatchNoDocsQuery):
        return set()
    if isinstance(q, BooleanQuery):
        required = [c.query for c in q.clauses if c.occur in ("MUST", "FILTER")]
        for r in required:  # any single required clause's triggers suffice
            t = trigger_terms(r)
            if t is not None:
                return t
        optional = [c.query for c in q.clauses if c.occur == "SHOULD"]
        if not optional:
            return None  # required clauses unprunable, or pure negation
        out = set()
        for o in optional:
            t = trigger_terms(o)
            if t is None:
                return None
            out |= t
        return out
    return None  # MatchAll / Prefix / Wildcard / Regexp / TermRange / unknown


def _match_one(q: Query, token_set: set, positions: dict) -> bool:
    """Evaluate one query against one document's token map — the MemoryIndex
    single-doc search.  Match-only (percolation reports membership, not
    scores)."""
    if isinstance(q, TermQuery):
        return q.term in token_set
    if isinstance(q, SynonymQuery):
        return any(t in token_set for t in q.synonyms)
    if isinstance(q, MatchAllQuery):
        return True
    if isinstance(q, MatchNoDocsQuery):
        return False
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return _match_one(q.query, token_set, positions)
    if isinstance(q, DisjunctionMaxQuery):
        return any(_match_one(d, token_set, positions) for d in q.disjuncts)
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in token_set)
    if isinstance(q, WildcardQuery):
        pat = re.compile(
            "^" + "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in q.pattern) + "$"
        )
        return any(pat.match(t) for t in token_set)
    if isinstance(q, RegexpQuery):
        pat = re.compile(f"^(?:{q.regex})$")
        return any(pat.match(t) for t in token_set)
    if isinstance(q, TermRangeQuery):
        for t in token_set:
            ok_lo = q.lower is None or (t >= q.lower if q.include_lower else t > q.lower)
            ok_hi = q.upper is None or (t <= q.upper if q.include_upper else t < q.upper)
            if ok_lo and ok_hi:
                return True
        return False
    if isinstance(q, TermInSetQuery):
        return any(t in token_set for t in q.in_terms)
    if isinstance(q, PhraseQuery):
        ps = [positions.get(t) for t in q.phrase_terms]
        if any(p is None for p in ps):
            return False
        if q.slop == 0:
            for p0 in ps[0]:
                if all((p0 + i) in ps[i] for i in range(1, len(ps))):
                    return True
            return False
        # sloppy: the engine's exact SloppyPhraseMatcher port decides —
        # identical semantics to index-side evaluation (freq > 0 = match)
        from ..functions.sloppyphrase import sloppy_phrase_freq

        return float(
            sloppy_phrase_freq(list(q.phrase_terms), [sorted(p) for p in ps], q.slop)
        ) > 0.0
    if isinstance(q, BooleanQuery):
        must = [c.query for c in q.clauses if c.occur in ("MUST", "FILTER")]
        should = [c.query for c in q.clauses if c.occur == "SHOULD"]
        must_not = [c.query for c in q.clauses if c.occur == "MUST_NOT"]
        if any(_match_one(m, token_set, positions) for m in must_not):
            return False
        if not all(_match_one(m, token_set, positions) for m in must):
            return False
        if should:
            n = sum(1 for s in should if _match_one(s, token_set, positions))
            need = q.minimum_should_match if q.minimum_should_match > 0 else (0 if must else 1)
            if n < need:
                return False
        elif not must:
            return False
        return True
    raise NotImplementedError(f"percolator: {type(q).__name__}")


class Percolator:
    """Registered-query matcher over a document DataFrame (or a streaming
    micro-batch).  ``queries`` maps query_id → Query tree."""

    def __init__(self, queries: dict, analyzer):
        self.queries = dict(queries)
        self.analyzer = analyzer
        self.triggers = {qid: trigger_terms(q) for qid, q in self.queries.items()}

    def match(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
        """(doc_id, query_id) for every (document, registered query) match.
        One Arrow pass; the query set and trigger index ride the closure
        (broadcast to every task)."""
        queries = self.queries
        triggers = self.triggers
        analyzer = self.analyzer
        always = [qid for qid, t in triggers.items() if t is None]
        by_term: dict = {}
        for qid, t in triggers.items():
            for term in t or ():
                by_term.setdefault(term, []).append(qid)

        def run(iterator):
            import pandas as pd

            for pdf in iterator:
                out_doc, out_q = [], []
                for did, txt in zip(pdf[id_col], pdf[text_col]):
                    toks = analyzer.tokens_with_positions(txt)
                    token_set = {t for t, _ in toks}
                    positions: dict = {}
                    for t, p in toks:
                        positions.setdefault(t, set()).add(p)
                    cand = set(always)
                    for t in token_set:
                        cand.update(by_term.get(t, ()))
                    for qid in cand:
                        if _match_one(queries[qid], token_set, positions):
                            out_doc.append(did)
                            out_q.append(qid)
                yield pd.DataFrame({"doc_id": out_doc, "query_id": out_q})

        from ..session import spread_partitions

        # per-row Python matching: widen single-file doc streams first
        # (no-op on partitioned production input)
        return spread_partitions(docs.select(id_col, text_col)).mapInPandas(
            run, schema="doc_id bigint, query_id string"
        )
