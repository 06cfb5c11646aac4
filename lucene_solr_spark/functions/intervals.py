"""Minimal-interval algebra — ``lucene/sandbox/.../search/intervals`` analog.

Reference semantics (``IntervalFunction.java`` ORDERED/UNORDERED,
``IntervalScorer.java:65-71``, ``IntervalScoreFunction.java:60-75``,
``IntervalQuery.java:73-75``):

- an intervals source enumerates the *minimal* intervals per document that
  contain all sub-sources (in order / in any order) — an interval is dropped
  when a strictly contained interval also matches (Vigna's minimal-interval
  semantics);
- ``Intervals.maxgaps(g, source)`` filters to intervals whose internal gap
  total is <= g;
- per-doc frequency = Σ over surviving intervals of
  ``1 / max(length - minExtent + 1, 1)`` with ``length = end - start + 1``
  and ``minExtent = n`` for n single-term sub-sources;
- default score = ``boost * (1 - pivot / (pivot + freq))`` with pivot = 1
  (the saturation function) — strictly monotone in freq, so ranking by freq
  is ranking by score.

Everything here is driver-free pure computation on sorted position arrays;
the distributed wiring lives in ``IndexSearcher.interval_query``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "minimal_ordered_intervals",
    "minimal_unordered_intervals",
    "interval_freq",
    "saturation_score",
]


def minimal_ordered_intervals(pos_lists: list) -> list:
    """Minimal intervals [(start, end, gaps)] containing one occurrence of
    each sub-term in order (strictly increasing positions) — the ORDERED
    iterator's output (``IntervalFunction.java:135-163``: each emitted
    candidate is replaced by any later-starting chain that does not push the
    end right, i.e. only the maximal start survives per distinct end).

    Equivalent direct form: for each start occurrence the greedy chain gives
    the minimal end e(s); e(s) is non-decreasing in s, so containment occurs
    exactly between candidates sharing an end — keep the last (maximal-start)
    candidate per distinct end.  Gaps for width-1 sub-sources telescope to
    ``end - start - (n-1)`` independent of interior choices (:165-171)."""
    from bisect import bisect_right

    n = len(pos_lists)
    pos_lists = [list(p) for p in pos_lists]
    if any(len(p) == 0 for p in pos_lists):
        return []
    if n == 1:
        return [(int(p), int(p), 0) for p in pos_lists[0]]
    cands = []
    for s in pos_lists[0]:
        prev = s
        ok = True
        for k in range(1, n):
            j = bisect_right(pos_lists[k], prev)
            if j >= len(pos_lists[k]):
                ok = False
                break
            prev = pos_lists[k][j]
        if not ok:
            break  # larger starts only fail sooner
        cands.append((int(s), int(prev)))
    out = []
    for i, (s, e) in enumerate(cands):
        if i + 1 < len(cands) and cands[i + 1][1] == e:
            continue  # a later (larger-start) candidate shares this end
        out.append((s, e, e - s - (n - 1)))
    return out


def minimal_unordered_intervals(pos_lists: list) -> list:
    """Minimal intervals [(start, end, gaps)] containing one occurrence of
    each sub-term in any order, overlaps allowed (``IntervalFunction.java``
    UNORDERED, :204-300).  Sweep: repeatedly advance the minimum pointer,
    recording each window; then drop windows that strictly contain another
    (the queue-based minimization's effect)."""
    n = len(pos_lists)
    pos_lists = [list(p) for p in pos_lists]
    if any(len(p) == 0 for p in pos_lists):
        return []
    if n == 1:
        return [(int(p), int(p), 0) for p in pos_lists[0]]
    idx = [0] * n
    cur = [pos_lists[k][0] for k in range(n)]
    cands = []
    while True:
        s, e = min(cur), max(cur)
        inner = sorted(cur)
        gaps = sum(max(0, inner[i + 1] - inner[i] - 1) for i in range(n - 1))
        cands.append((int(s), int(e), int(gaps)))
        k = min(range(n), key=lambda j: cur[j])
        idx[k] += 1
        if idx[k] >= len(pos_lists[k]):
            break
        cur[k] = pos_lists[k][idx[k]]
    # minimality: candidates have non-decreasing start; keep (s, e) iff no
    # later candidate is strictly contained — scan right-to-left tracking the
    # smallest end seen at a strictly larger start
    out = []
    best_e = None
    prev = None
    for s, e, g in reversed(cands):
        if (best_e is None or e < best_e) and (s, e) != prev:
            out.append((s, e, g))
            best_e = e
            prev = (s, e)
    out.reverse()
    return out


def interval_freq(intervals: list, min_extent: int, max_gaps: int | None = None) -> np.float32:
    """Σ 1/max(length - minExtent + 1, 1) over intervals passing the maxgaps
    filter (``IntervalScorer.java:65-68``, ``Intervals.maxgaps``).  Summed in
    ascending start order (the reference's enumeration order), float32 each
    step as the reference accumulates in float."""
    f = np.float32(0.0)
    for s, e, g in intervals:
        if max_gaps is not None and g > max_gaps:
            continue
        length = e - s + 1
        f = np.float32(f + np.float32(1.0) / np.float32(max(length - min_extent + 1, 1)))
    return f


def interval_freq_quantized(intervals: list, min_extent: int, max_gaps: int | None = None) -> int:
    """Order-free exact-integer variant for the driver contract: each
    surviving interval's float32 contribution is quantized to a 2^-20
    fixed-point BIGINT and summed exactly (same device as classify.py —
    bitwise-reproducible on any cluster and in the DuckDB oracle)."""
    total = 0
    for s, e, g in intervals:
        if max_gaps is not None and g > max_gaps:
            continue
        length = e - s + 1
        c = np.float32(1.0) / np.float32(max(length - min_extent + 1, 1))
        total += int(np.floor(np.float64(c) * 1048576.0))
    return total


def saturation_score(freq, boost: float = 1.0, pivot: float = 1.0) -> np.float32:
    """weight * (1 - pivot/(pivot + freq)) (``IntervalScoreFunction.java:
    66-74`` — the rewritten form that can't decrease with freq)."""
    return np.float32(
        np.float32(boost) * (np.float32(1.0) - np.float32(pivot) / np.float32(np.float32(pivot) + freq))
    )
