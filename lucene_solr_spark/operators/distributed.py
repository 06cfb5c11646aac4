"""Sharded search over multiple index parts with GLOBAL statistics.

Reference shape: Solr's distributed two-phase search
(``solr/core/src/java/org/apache/solr/handler/component/QueryComponent.java:
495-590`` PURPOSE_GET_TOP_IDS -> mergeIds -> PURPOSE_GET_FIELDS) combined
with the exact global-stats protocol (``solr/core/src/java/org/apache/solr/
search/stats/ExactStatsCache.java``: per-shard term statistics are gathered
and SUMMED before scoring so every shard scores with collection-level
df/ttf/docCount — without it, per-shard IDF skews ranks). Lucene-side this
is ``MultiReader`` + ``IndexSearcher``: ``TermStates.build`` walks every
leaf and accumulates (``index/TermStates.java:102``), and ``TopDocs.merge``
k-way merges the per-leaf top-k (``search/TopDocs.java:75-90``).

Spark-first shape: each part keeps its own postings DataFrame (e.g. the
output of ``merge.split_index`` — the re-sharding primitive); the global
stats come from ONE tiny union-aggregate over the parts' terms tables
(manifest-scale rows). Scoring reuses the single-index ``IndexSearcher``
verbatim on a stats-overridden facade of each part (``dataclasses.replace``
— postings untouched), so every query type the engine supports is available
per part, and the global reduce is the same
``orderBy(score desc, doc_id).limit(k)`` TakeOrderedAndProject.  Because
scores depend only on (global stats, per-doc tf, norm), the sharded result
is BIT-IDENTICAL to searching the undivided index — the distributed
control-vs-sharded equivalence Solr's BaseDistributedSearchTestCase checks.
"""

from __future__ import annotations

from dataclasses import replace
from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .indexer import InvertedIndex
from .searcher import IndexSearcher, TopDocs

__all__ = ["MultiIndexSearcher"]


class MultiIndexSearcher:
    """Search N index parts as one logical index (ExactStatsCache semantics).

    ``parts`` must share an analyzer/codec config and carry GLOBAL doc_ids
    (true for ``split_index`` outputs and for independently-built runs over
    disjoint doc ranges)."""

    def __init__(self, parts: list, corpus: Optional[DataFrame] = None, similarity=None):
        if not parts:
            raise ValueError("need at least one index part")
        self.parts: list[InvertedIndex] = list(parts)
        self.corpus = corpus
        # ---- ExactStatsCache: one union-aggregate over the terms tables
        terms = reduce(
            lambda a, b: a.unionByName(b), [p.terms.select("term", "df", "ttf") for p in self.parts]
        )
        self._global_terms = (
            terms.groupBy("term")
            .agg(F.sum("df").cast("bigint").alias("df"), F.sum("ttf").cast("bigint").alias("ttf"))
            .persist()
        )
        self._doc_count = sum(int(p.doc_count) for p in self.parts)
        self._sum_ttf = sum(int(p.sum_ttf) for p in self.parts)
        # per-part searcher over a stats-overridden facade: postings/docs stay
        # the part's own, stats are collection-level
        self._searchers = [
            IndexSearcher(
                replace(
                    p, terms=self._global_terms, doc_count=self._doc_count, sum_ttf=self._sum_ttf
                ),
                corpus=corpus,
                similarity=similarity,
            )
            for p in self.parts
        ]

    @property
    def doc_count(self) -> int:
        return self._doc_count

    def search(self, query, k: int = 10, prune: bool = True) -> TopDocs:
        """Phase 1 per shard (top-k with global stats) -> TopDocs.merge:
        union of the per-part top-k frames, global (score desc, doc_id asc)
        TakeOrderedAndProject — only k rows per part reach the reduce."""
        frames = [s.search(query, k, prune=prune).df for s in self._searchers]
        merged = reduce(lambda a, b: a.unionByName(b), frames)
        return TopDocs(merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k), k)

    def count(self, query) -> int:
        from ..plans.query import TermQuery

        # Weight#count fast path: a TermQuery's hit count IS the GLOBAL
        # docFreq — already summed in the stats table; summing per-part
        # counts would multiply it by the part count
        if isinstance(query, TermQuery) and all(p.deletes is None for p in self.parts):
            st = self._searchers[0]._term_stats({query.term}).get(query.term)
            return int(st[0]) if st else 0
        return sum(s.count(query) for s in self._searchers)

    def fetch(self, top: TopDocs, columns: list) -> DataFrame:
        """Phase 2 (PURPOSE_GET_FIELDS): broadcast semi-join of the k winners
        back to the corpus — delegated to any part's searcher."""
        return self._searchers[0].fetch(top, columns=columns)
