"""Nested minimal-interval algebra: Intervals.term/or/phrase/ordered/unordered.

Reference: ``lucene/sandbox/src/java/org/apache/lucene/search/intervals/
Intervals.java`` (the source combinators), ``IntervalFunction.java`` (BLOCK =
phrase :61-107, ORDERED :135-171, UNORDERED :204-300),
``DisjunctionIntervalsSource.java`` (or), ``IntervalQuery.java`` /
``IntervalScorer.java:65-68`` (freq = Σ 1/(length − minExtent + 1)).

Semantics: every combinator emits the MINIMAL matching intervals — the
matching intervals that strictly contain no other matching interval — which
is the reference iterators' contract (each MinimizingIntervalsSource wrapper
suppresses an interval when a contained one exists).  Verified against a
brute-force enumerate-all-then-filter control in ``test_interval_sources``.

Per-document evaluation over tiny position lists (a document's occurrences
of the query terms): everything here is driver/UDF-side pure Python+numpy;
the distributed shape (bulk .pos decode, one doc_id shuffle, Arrow batches)
lives in ``IndexSearcher.interval_source_query``.

Interval representation: ``(start, end, gaps)`` with inclusive ends.  Gaps
compose: term 0; or = the winning sub's gaps; phrase = Σ sub gaps (blocks
are adjacent); ordered = Σ chain gaps + Σ sub gaps.  Unordered gap
accounting is supported for term-only operands (the flat reference case) and
reported as 0 otherwise (documented deviation; ``maxgaps`` filtering of
nested unordered sources is rejected).
"""

from __future__ import annotations

from bisect import bisect_right
from dataclasses import dataclass
from typing import Optional

import numpy as np


class IntervalsSource:
    pass


@dataclass(frozen=True)
class ITerm(IntervalsSource):
    term: str


@dataclass(frozen=True)
class IOr(IntervalsSource):
    subs: tuple


@dataclass(frozen=True)
class IPhrase(IntervalsSource):
    subs: tuple


@dataclass(frozen=True)
class IOrdered(IntervalsSource):
    subs: tuple
    max_gaps: Optional[int] = None


@dataclass(frozen=True)
class IUnordered(IntervalsSource):
    subs: tuple
    max_gaps: Optional[int] = None


def source_terms(src: IntervalsSource) -> set:
    if isinstance(src, ITerm):
        return {src.term}
    out: set = set()
    for s in src.subs:
        out |= source_terms(s)
    return out


def min_extent(src: IntervalsSource) -> int:
    """``IntervalsSource.minExtent``: term 1; or = min over subs;
    phrase/ordered/unordered = Σ sub extents."""
    if isinstance(src, ITerm):
        return 1
    if isinstance(src, IOr):
        return min(min_extent(s) for s in src.subs)
    return sum(min_extent(s) for s in src.subs)


def _dedupe_keep_min_gaps(cands: list) -> dict:
    best: dict = {}
    for s, e, g in cands:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    return best


def minimize(cands: list) -> list:
    """[(s, e, gaps)] → minimal set: no survivor strictly contains another
    survivor's span; equal spans dedupe to the smallest-gap representative."""
    best = _dedupe_keep_min_gaps(cands)
    # descending start; within an equal start ASCENDING end, so an
    # equal-start-smaller-end span is seen before the spans it suppresses
    spans = sorted(best, key=lambda k: (k[0], -k[1]))
    out = []
    min_end_seen = None
    # a span survives iff no OTHER span has start >= s and end <= e
    for s, e in reversed(spans):
        if min_end_seen is None or e < min_end_seen:
            out.append((s, e, best[(s, e)]))
            min_end_seen = e
    out.reverse()
    return out


def evaluate(src: IntervalsSource, positions: dict) -> list:
    """Minimal intervals [(start, end, gaps)] of ``src`` over one document's
    ``positions`` (term → sorted position list)."""
    if isinstance(src, ITerm):
        return [(int(p), int(p), 0) for p in positions.get(src.term, ())]
    subs = [evaluate(s, positions) for s in src.subs]
    if isinstance(src, IOr):
        return minimize([iv for sub in subs for iv in sub])
    if any(not sub for sub in subs):
        return []
    if isinstance(src, (IPhrase, IOrdered)):
        adjacency = isinstance(src, IPhrase)
        # containment-free sub lists have strictly increasing starts AND ends
        cands = []
        if adjacency:
            by_start = [{iv[0]: iv for iv in sub} for sub in subs]
            for s0, e0, g0 in subs[0]:
                s, e, g = s0, e0, g0
                ok = True
                for k in range(1, len(subs)):
                    nxt = by_start[k].get(e + 1)
                    if nxt is None:
                        ok = False
                        break
                    e, g = nxt[1], g + nxt[2]
                if ok:
                    cands.append((s, e, g))
        else:
            starts = [[iv[0] for iv in sub] for sub in subs]
            for s0, e0, g0 in subs[0]:
                s, e, g = s0, e0, g0
                ok = True
                for k in range(1, len(subs)):
                    j = bisect_right(starts[k], e)
                    if j >= len(subs[k]):
                        ok = False
                        break
                    s2, e2, g2 = subs[k][j]
                    g += (s2 - e - 1) + g2
                    e = e2
                if not ok:
                    break  # larger starts only fail sooner
                cands.append((s, e, g))
        out = minimize(cands)
        if getattr(src, "max_gaps", None) is not None:
            out = [iv for iv in out if iv[2] <= src.max_gaps]
        return out
    if isinstance(src, IUnordered):
        if src.max_gaps is not None and not all(isinstance(s, ITerm) for s in src.subs):
            raise NotImplementedError("maxgaps on nested unordered sources")
        n = len(subs)
        idx = [0] * n
        cands = []
        while True:
            cur = [subs[k][idx[k]] for k in range(n)]
            s = min(iv[0] for iv in cur)
            e = max(iv[1] for iv in cur)
            if all(isinstance(x, ITerm) for x in src.subs):
                inner = sorted(iv[0] for iv in cur)
                g = sum(max(0, inner[i + 1] - inner[i] - 1) for i in range(n - 1))
            else:
                g = 0
            cands.append((int(s), int(e), int(g)))
            k = min(range(n), key=lambda j: subs[j][idx[j]][0])
            idx[k] += 1
            if idx[k] >= len(subs[k]):
                break
        out = minimize(cands)
        if src.max_gaps is not None:
            out = [iv for iv in out if iv[2] <= src.max_gaps]
        return out
    raise NotImplementedError(type(src).__name__)


def source_freq(src: IntervalsSource, positions: dict) -> np.float32:
    """IntervalScorer freq: Σ 1/max(length − minExtent + 1, 1), float32
    accumulation in ascending start order (IntervalScorer.java:65-68)."""
    me = min_extent(src)
    f = np.float32(0.0)
    for s, e, _ in evaluate(src, positions):
        f = np.float32(f + np.float32(1.0) / np.float32(max(e - s + 1 - me + 1, 1)))
    return f


def source_freq_quantized(src: IntervalsSource, positions: dict) -> int:
    """Order-free 2^-20 fixed-point variant for oracle-checked contracts."""
    me = min_extent(src)
    total = 0
    for s, e, _ in evaluate(src, positions):
        c = np.float32(1.0) / np.float32(max(e - s + 1 - me + 1, 1))
        total += int(np.floor(np.float64(c) * 1048576.0))
    return total
