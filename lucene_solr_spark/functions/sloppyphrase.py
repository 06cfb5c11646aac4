"""Exact Lucene sloppy-phrase matching semantics, re-expressed in Python.

Semantics of the reference ``lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseMatcher.java`` (v9 fork), used by the searcher's phrase verify
pass:

- each phrase slot k is a PhrasePositions stream over the doc positions of
  its term, with ``position = docPos - k`` so that aligned slots share a
  position (``PhrasePositions.java:51-57``);
- matches are found by a min-queue walk minimizing ``matchLength = end -
  min.position`` (``SloppyPhraseMatcher.nextMatch:120-152``); a match exists
  whenever ``matchLength <= slop`` — order-insensitive slack, NOT the
  in-order-only simplification;
- repeated phrase terms form repeat groups, initialized collision-free by
  advancing the j-th repeat j extra times and resolved during the walk by
  advancing the lesser of two colliding streams
  (``advanceRpts:230-262``, ``advanceRepeatGroups:370-401``);
- the scorer accumulates ``freq += 1f/(1f + matchLength)`` per match in
  float32 (``sloppyWeight:115-117``, ``PhraseScorer.java:71-77``) and feeds
  that float freq to the similarity.

The queue is a scan-min over ≤ |phrase| streams keyed ``(position, offset,
ord)`` exactly as ``PhraseQueue.java:28-38`` — at phrase arity the O(n) scan
replaces the binary heap (and makes the reference's re-queue bookkeeping
after repeat collisions unnecessary: there are no stale heap keys).
"""
from __future__ import annotations

import numpy as np

__all__ = ["sloppy_phrase_freq"]


class _PP:
    __slots__ = ("positions", "idx", "position", "offset", "ord", "rpt_group")

    def __init__(self, positions, offset: int, ord_: int):
        self.positions = positions
        self.offset = offset
        self.ord = ord_
        self.idx = 0
        self.position = 0
        self.rpt_group = -1

    def first_position(self) -> bool:
        self.idx = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.idx < len(self.positions):
            self.position = self.positions[self.idx] - self.offset
            self.idx += 1
            return True
        return False

    def tp_pos(self) -> int:
        return self.position + self.offset

    def key(self):
        return (self.position, self.offset, self.ord)


def sloppy_phrase_freq(
    terms: list, pos_lists: list, slop: int, offsets: list | None = None
) -> np.float32:
    """Accumulated sloppy freq for one document: Σ 1f/(1f+matchLength) over
    the match sequence the reference's matcher produces, float32 arithmetic.

    ``terms``: the phrase slots — a plain string per slot, or (for the
    MultiPhraseQuery union-postings path) a set/frozenset/tuple of a slot's
    alternative terms.  Slots sharing any term form a repeat group
    (``SloppyPhraseMatcher.gatherRptTerms:417-444`` marks repeats by term
    membership across PhrasePositions; for plain strings this reduces to
    string equality, so single-term phrases behave exactly as before).
    ``pos_lists``: per slot, the ascending doc positions of that slot's
    term(s) (repeated terms therefore pass identical lists).
    ``offsets``: explicit phrase position per slot (MultiPhraseQuery
    Builder.add(terms, position) gaps); None = consecutive 0..n-1.
    Returns 0.0 when any slot has no positions or no alignment is within
    ``slop``.
    """
    n = len(terms)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return np.float32(0.0)
    if n == 1:
        # one slot: every position matches with matchLength 0 (weight 1) —
        # Lucene rewrites this to a TermQuery, same freq
        return np.float32(len(pos_lists[0]))

    offs = list(offsets) if offsets is not None else list(range(n))
    pps = [_PP(pos_lists[i], offs[i], i) for i in range(n)]

    # repeat groups: slots sharing a term (union-find over the slots' term
    # sets), members sorted by (query) offset (sortRptGroups:446-463)
    term_sets = [frozenset([t]) if isinstance(t, str) else frozenset(t) for t in terms]
    parent = list(range(n))

    def _find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    owner: dict = {}
    for i, ts in enumerate(term_sets):
        for t in ts:
            if t in owner:
                parent[_find(i)] = _find(owner[t])
            else:
                owner[t] = i
    comps: dict = {}
    for i in range(n):
        comps.setdefault(_find(i), []).append(pps[i])
    groups: list[list[_PP]] = []
    for g in comps.values():
        if len(g) > 1:
            g.sort(key=lambda pp: pp.offset)
            for pp in g:
                pp.rpt_group = len(groups)
            groups.append(g)
    has_rpts = bool(groups)

    # --- init per doc (initPhrasePositions / placeFirstPositions)
    for pp in pps:
        if not pp.first_position():
            return np.float32(0.0)
    if has_rpts:
        # advanceRepeatGroups (no multi-term postings in this engine):
        # j-th repeat advances j extra times so no two repeats collide
        for rg in groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return np.float32(0.0)

    end = max(pp.position for pp in pps)
    queue = list(pps)

    def pop_min() -> _PP:
        m = min(queue, key=_PP.key)
        queue.remove(m)
        return m

    def advance_pp(pp: _PP) -> bool:
        nonlocal end
        if not pp.next_position():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def lesser(a: _PP, b: _PP) -> _PP:
        if a.position < b.position or (a.position == b.position and a.offset < b.offset):
            return a
        return b

    def advance_rpts(pp: _PP) -> bool:
        # resolve the (single possible) collision by advancing the lesser
        # of the two colliding streams (advanceRpts:230-262)
        if pp.rpt_group < 0:
            return True
        rg = groups[pp.rpt_group]
        while True:
            other = next((p2 for p2 in rg if p2 is not pp and p2.tp_pos() == pp.tp_pos()), None)
            if other is None:
                return True
            pp = lesser(pp, other)
            if not advance_pp(pp):
                return False

    positioned = True
    match_length = [1 << 31]

    def next_match() -> bool:
        nonlocal positioned
        if not positioned:
            return False
        pp = pop_min()
        match_length[0] = end - pp.position
        nxt = min(queue, key=_PP.key).position
        while advance_pp(pp):
            if has_rpts and not advance_rpts(pp):
                break
            if pp.position > nxt:  # done minimizing current match-length
                queue.append(pp)
                if match_length[0] <= slop:
                    return True
                pp = pop_min()
                nxt = min(queue, key=_PP.key).position
                match_length[0] = end - pp.position
            else:
                ml2 = end - pp.position
                if ml2 < match_length[0]:
                    match_length[0] = ml2
        positioned = False
        return match_length[0] <= slop

    # PhraseScorer freq accumulation (PhraseScorer.java:71-77), float32
    if not next_match():
        return np.float32(0.0)
    freq = np.float32(1.0) / (np.float32(1.0) + np.float32(match_length[0]))
    while next_match():
        freq = np.float32(freq + np.float32(1.0) / (np.float32(1.0) + np.float32(match_length[0])))
    return freq
