"""FastVectorHighlighter: term-vector highlighting with phrase support.

Reference: ``lucene/highlighter/src/java/org/apache/lucene/search/
vectorhighlight/``:

- ``FieldQuery.java`` — flatten the query into term/phrase entries, build a
  ``QueryPhraseMap`` trie rooted at each phrase-head term (boost + seqnum on
  terminal nodes).
- ``FieldTermStack.java:109-119`` — the per-document term vector (text,
  position, startOffset, endOffset) restricted to query terms, each carrying
  ``weight = f32(ln(numDocs / (df + 1)) + 1)``.  This repo stores no term
  vectors (re-analysis of the k winners is the declared strategy — the same
  trade UnifiedHighlighter's re-analysis offset source makes), so the stack
  is rebuilt from stored text with the index token pattern.
- ``FieldPhraseList.java:68-122`` — longest-match phrase extraction with
  backtracking (pop the candidate tail, re-search shorter prefixes) and
  ``addIfNoOverlap`` merging.
- ``BaseFragListBuilder.java:47-100`` — margin-centred fragment windows
  (MARGIN_DEFAULT=6, minFragCharSize=margin*3) pulling phrases until the
  window boundary, ``acceptPhrase`` (multi-term phrases longer than the
  fragment are discarded).
- ``SimpleFieldFragList.java`` / ``WeightedFieldFragList.java`` — fragment
  totalBoost: plain boost sum vs distinct-term idf-weighted sum bent by
  ``sqrt(#terms)``.
- ``ScoreOrderFragmentsBuilder.java`` (sort by totalBoost desc, startOffset
  asc) / ``BaseFragmentsBuilder.java`` ``makeFragment`` (boundary-adjusted
  source slice + per-seqnum pre/post tags — the colored-tags path) /
  ``SimpleBoundaryScanner.java`` (maxScan=20, boundary chars ``.,!? \\t\\n``).

Spark shape: a k-row post-pass — only the top-k winners reach this operator,
their stored text arrives through the doc_id join (the GET_FIELDS fetch), and
ONE ``mapInPandas`` computes stacks, phrase lists, windows, and tagged
fragments per row.  Nothing corpus-scale shuffles here, so the operator's
cost is O(k · doc_len) regardless of corpus size.

Documented deviations (single-token positions, no token graphs):
- sloppy phrases (slop > 0) are not supported — ``FieldQuery.searchPhrase``'s
  slop window needs position-stacked term vectors we don't keep; a slop=0
  phrase trie covers the PhraseQuery/BooleanQuery surface the contract uses.
- the reference's same-position synonym loop (``ti.getNext() != first``)
  degenerates to a no-op on single-position stacks.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import DataFrame, functions as F

# ASCII-alnum runs on the ORIGINAL string (case handled per token) so
# match offsets always index the string the fragments slice
_TOKEN_RE = re.compile(r"[a-zA-Z0-9]+")

# SimpleBoundaryScanner.DEFAULT_BOUNDARY_CHARS / DEFAULT_MAX_SCAN
_BOUNDARY_CHARS = {".", ",", "!", "?", " ", "\t", "\n"}
_DEFAULT_MAX_SCAN = 20

# BaseFragListBuilder.MARGIN_DEFAULT / MIN_FRAG_CHAR_SIZE_FACTOR
_MARGIN_DEFAULT = 6
_MIN_FRAG_FACTOR = 3


# --------------------------------------------------------------- FieldQuery
@dataclass
class _PhraseNode:
    """QueryPhraseMap node: trie of phrase continuations, terminal carries
    (boost, seqnum = termOrPhraseNumber)."""

    children: dict = field(default_factory=dict)
    terminal: bool = False
    boost: float = 0.0
    seqnum: int = -1


def _flatten(query, boost: float, out: list) -> None:
    """FieldQuery.flatten analog: (terms-tuple, boost) per term/phrase.
    Positive boolean clauses recurse; unknown query types contribute
    nothing (the reference's visitor ignores them too)."""
    from ..plans.query import (
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        PhraseQuery,
        SynonymQuery,
        TermQuery,
    )

    if isinstance(query, TermQuery):
        out.append(((query.term,), boost * query.boost))
    elif isinstance(query, SynonymQuery):
        for t in query.synonyms:
            out.append(((t,), boost * query.boost))
    elif isinstance(query, PhraseQuery):
        if query.slop:
            raise NotImplementedError("FVH phrase trie is slop=0 only")
        out.append((tuple(query.phrase_terms), boost * query.boost))
    elif isinstance(query, BoostQuery):
        _flatten(query.query, boost * query.boost, out)
    elif isinstance(query, ConstantScoreQuery):
        _flatten(query.query, boost, out)
    elif isinstance(query, BooleanQuery):
        for cl in query.clauses:
            if cl.occur != "MUST_NOT":
                _flatten(cl.query, boost, out)
    elif isinstance(query, DisjunctionMaxQuery):
        for cl in query.disjuncts:
            _flatten(cl, boost, out)
    # else: non-term query (range/wildcard/...) — contributes no highlights


def build_phrase_trie(query_or_entries, boost: float = 1.0) -> dict:
    """Root QueryPhraseMap: {head-term: _PhraseNode}.  Accepts a Query or a
    pre-flattened list of ``(terms-tuple, boost)``."""
    if isinstance(query_or_entries, (list, tuple)):
        flat = [(tuple(t), b) for t, b in query_or_entries]
    else:
        flat = []
        _flatten(query_or_entries, boost, flat)
    root: dict = {}
    for seq, (terms, b) in enumerate(flat):
        node = root.setdefault(terms[0], _PhraseNode())
        for t in terms[1:]:
            node = node.children.setdefault(t, _PhraseNode())
        node.terminal, node.boost, node.seqnum = True, float(b), seq
    return root


def _search_phrase(root: dict, cand: list):
    """FieldQuery.searchPhrase: walk the trie from the root for the candidate
    term sequence; a terminal node means a valid term-or-phrase."""
    node = root.get(cand[0][0])
    for t in cand[1:]:
        if node is None:
            return None
        node = node.children.get(t[0])
    return node if node is not None and node.terminal else None


# ----------------------------------------------------------- FieldPhraseList
@dataclass
class _WPI:
    """WeightedPhraseInfo: merged char offsets + boost + seqnum + terms."""

    start: int
    end: int
    boost: float
    seqnum: int
    toffs: list  # [[start, end], ...] — adjacent positions merged (Toffs)
    terms: list  # term texts (termsInfos), kept for the weighted frag list


def _make_wpi(cand: list, boost: float, seqnum: int) -> _WPI:
    # WeightedPhraseInfo ctor: consecutive positions extend the last Toffs
    toffs = [[cand[0][2], cand[0][3]]]
    pos = cand[0][1]
    for t in cand[1:]:
        if t[1] - pos == 1:
            toffs[-1][1] = t[3]
        else:
            toffs.append([t[2], t[3]])
        pos = t[1]
    return _WPI(cand[0][2], cand[-1][3], boost, seqnum, toffs, [t[0] for t in cand])


def _add_if_no_overlap(plist: list, wpi: _WPI) -> None:
    for exist in plist:
        if wpi.start < exist.end and exist.start < wpi.end:
            exist.terms.extend(wpi.terms)  # FieldPhraseList.addIfNoOverlap
            return
    plist.append(wpi)


def field_phrase_list(tokens: list, root: dict, phrase_limit: int = 5000) -> list:
    """FieldPhraseList over a single-position token list.

    ``tokens`` rows are ``(text, position, startOffset, endOffset)``.  The
    longest trie walk wins; on a dead end the candidate tail pops back one
    term at a time until a shorter valid phrase (or nothing) matches —
    FieldPhraseList.java:86-116's stack push-back, re-expressed on indexes.
    """
    out: list = []
    i, n = 0, len(tokens)
    while i < n and len(out) < phrase_limit:
        node = root.get(tokens[i][0])
        if node is None:
            i += 1
            continue
        cand = [tokens[i]]
        curr = node
        j = i + 1
        while j < n:
            nxt = curr.children.get(tokens[j][0])
            if nxt is None or tokens[j][1] - cand[-1][1] != 1:
                break
            cand.append(tokens[j])
            curr = nxt
            j += 1
        if curr.terminal:
            _add_if_no_overlap(out, _make_wpi(cand, curr.boost, curr.seqnum))
            i += len(cand)
        else:
            matched = False
            while len(cand) > 1:
                cand.pop()
                m = _search_phrase(root, cand)
                if m is not None:
                    _add_if_no_overlap(out, _make_wpi(cand, m.boost, m.seqnum))
                    matched = True
                    break
            i += len(cand) if matched else 1
    return out


# ---------------------------------------------------------- FragListBuilder
@dataclass
class _FragInfo:
    start: int
    end: int
    boost: float  # totalBoost
    subinfos: list  # [(seqnum, toffs, sub_boost)] in phrase order


def _accept_phrase(wpi: _WPI, match_length: int, frag_char_size: int) -> bool:
    # BaseFragListBuilder.acceptPhrase
    return len(wpi.toffs) <= 1 or match_length <= frag_char_size


def build_frag_list(
    phrase_list: list,
    frag_char_size: int,
    margin: int = _MARGIN_DEFAULT,
    weighted: bool = False,
    term_weights: dict | None = None,
) -> list:
    """BaseFragListBuilder.createFieldFragList — the exact window walk:
    margin-bounded span, pull phrases until the span end, then re-center on
    ``(fragCharSize - matchLen) / 2`` and advance ``startOffset`` past the
    span."""
    min_frag = max(1, margin * _MIN_FRAG_FACTOR)
    if frag_char_size < min_frag:
        raise ValueError(f"fragCharSize({frag_char_size}) must be >= {min_frag}")
    frags: list = []
    start_offset = 0
    k, n = 0, len(phrase_list)
    while k < n:
        phrase = phrase_list[k]
        if phrase.start < start_offset:
            k += 1
            continue
        wpil = []
        cur_start = phrase.start
        cur_end = phrase.end
        span_start = max(cur_start - margin, start_offset)
        span_end = max(cur_end, span_start + frag_char_size)
        if _accept_phrase(phrase, cur_end - cur_start, frag_char_size):
            wpil.append(phrase)
        k += 1
        while k < n:
            nxt = phrase_list[k]
            if nxt.end <= span_end:
                cur_end = nxt.end
                if _accept_phrase(nxt, cur_end - cur_start, frag_char_size):
                    wpil.append(nxt)
                k += 1
            else:
                break
        if not wpil:
            continue
        match_len = cur_end - cur_start
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = cur_start - new_margin
        if span_start < start_offset:
            span_start = start_offset
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end
        frags.append(_frag_add(span_start, span_end, wpil, weighted, term_weights))
    return frags


def _frag_add(start, end, wpil, weighted, term_weights) -> _FragInfo:
    if not weighted:
        # SimpleFieldFragList.add
        total = np.float32(0.0)
        subs = []
        for p in wpil:
            subs.append((p.seqnum, p.toffs, float(p.boost)))
            total = np.float32(total + np.float32(p.boost))
        return _FragInfo(start, end, float(total), subs)
    # WeightedFieldFragList.add: distinct-term idf weights, sqrt(length) bend
    tw = term_weights or {}
    distinct: set = set()
    length = 0
    temp = []
    for p in wpil:
        pboost = np.float32(0.0)
        for t in p.terms:
            if t not in distinct:
                distinct.add(t)
                pboost = np.float32(
                    pboost + np.float32(np.float32(tw.get(t, 1.0)) * np.float32(p.boost))
                )
            length += 1
        temp.append((p.seqnum, p.toffs, pboost))
    norm = np.float32(length * (1.0 / math.sqrt(length))) if length else np.float32(0)
    total = np.float32(0.0)
    subs = []
    for seq, toffs, pb in temp:
        sb = np.float32(pb * norm)
        subs.append((seq, toffs, float(sb)))
        total = np.float32(total + sb)
    return _FragInfo(start, end, float(total), subs)


# --------------------------------------------------------- FragmentsBuilder
def _find_start_offset(text: str, start: int, max_scan: int) -> int:
    if start > len(text) or start < 1:
        return start
    offset, count = start, max_scan
    while offset > 0 and count > 0:
        if text[offset - 1] in _BOUNDARY_CHARS:
            return offset
        offset -= 1
        count -= 1
    return 0 if offset == 0 else start


def _find_end_offset(text: str, start: int, max_scan: int) -> int:
    if start > len(text) or start < 0:
        return start
    offset, count = start, max_scan
    while offset < len(text) and count > 0:
        if text[offset] in _BOUNDARY_CHARS:
            return offset
        offset += 1
        count -= 1
    return start


def _get_tag(tags: tuple, num: int) -> str:
    # BaseFragmentsBuilder.getPreTag: tags[num] when it exists, else tags[0]
    return tags[num] if num < len(tags) else tags[0]


def make_fragment(
    text: str,
    frag: _FragInfo,
    pre_tags: tuple = ("<b>",),
    post_tags: tuple = ("</b>",),
    boundary_max_scan: int = _DEFAULT_MAX_SCAN,
) -> str:
    """BaseFragmentsBuilder.makeFragment + getFragmentSourceMSO on a
    single-valued field."""
    buffer_len = len(text)
    eo = (
        buffer_len
        if buffer_len < frag.end
        else _find_end_offset(text, frag.end, boundary_max_scan)
    )
    mso = _find_start_offset(text, frag.start, boundary_max_scan)
    src = text[mso:eo]
    parts = []
    idx = 0
    for seqnum, toffs, _b in frag.subinfos:
        for ts, te in toffs:
            parts.append(src[idx : ts - mso])
            parts.append(_get_tag(pre_tags, seqnum))
            parts.append(src[ts - mso : te - mso])
            parts.append(_get_tag(post_tags, seqnum))
            idx = te - mso
    parts.append(src[idx:])
    return "".join(parts)


def highlight_document(
    text: str,
    trie: dict,
    frag_char_size: int = 100,
    max_num_fragments: int = 1,
    weighted: bool = False,
    term_weights: dict | None = None,
    score_order: bool = True,
    pre_tags: tuple = ("<b>",),
    post_tags: tuple = ("</b>",),
    margin: int = _MARGIN_DEFAULT,
    boundary_max_scan: int = _DEFAULT_MAX_SCAN,
    phrase_limit: int = 5000,
    token_re: re.Pattern = _TOKEN_RE,
):
    """One document end-to-end: (n_frags, best_boost, [fragments]).

    FastVectorHighlighter.getBestFragments: FieldTermStack → FieldPhraseList
    → FragListBuilder → FragmentsBuilder.createFragments(maxNumFragments).
    """
    # tokenize the ORIGINAL text and lowercase per token: str.lower() on the
    # whole string can change its length (e.g. 'İ' → 'i̇'), which would
    # shift every later offset off the original string the fragments slice
    tokens = [
        (m.group().lower(), p, m.start(), m.end())
        for p, m in enumerate(token_re.finditer(text))
    ]
    plist = field_phrase_list(tokens, trie, phrase_limit)
    frags = build_frag_list(plist, frag_char_size, margin, weighted, term_weights)
    if not frags:
        return 0, 0.0, []
    ordered = (
        sorted(frags, key=lambda f: (-f.boost, f.start)) if score_order else frags
    )
    best = ordered[0].boost
    out = [
        make_fragment(text, f, pre_tags, post_tags, boundary_max_scan)
        for f in ordered[:max_num_fragments]
    ]
    return len(frags), best, out


def fvh_highlight(
    searcher,
    top,
    query,
    frag_char_size: int = 100,
    max_num_fragments: int = 1,
    frag_list: str = "simple",
    score_order: bool = True,
    pre_tags: tuple = ("<b>",),
    post_tags: tuple = ("</b>",),
    margin: int = _MARGIN_DEFAULT,
    boundary_max_scan: int = _DEFAULT_MAX_SCAN,
    phrase_limit: int = 5000,
) -> DataFrame:
    """FVH over the top-k winners: ``(doc_id, score, n_frags, frag_score,
    fragments)`` — ``frag_score`` is the best fragment's totalBoost.

    ``frag_list`` selects SimpleFragListBuilder (``"simple"``) or
    WeightedFragListBuilder (``"weighted"``, FieldTermStack idf weights
    ``f32(ln(numDocs / (df + 1)) + 1)`` fetched from the term dictionary).
    """
    if searcher.corpus is None:
        raise ValueError("fvh_highlight needs IndexSearcher(corpus=...)")
    if frag_list not in ("simple", "weighted"):
        raise ValueError(f"unknown frag_list {frag_list!r}")
    weighted = frag_list == "weighted"
    trie = build_phrase_trie(query)

    term_weights = None
    if weighted:
        terms = set(trie)
        stack = [n for n in trie.values()]
        while stack:
            node = stack.pop()
            terms.update(node.children)
            stack.extend(node.children.values())
        stats = searcher._term_stats(terms)
        num_docs = searcher.index.doc_count
        term_weights = {
            t: float(np.float32(math.log(num_docs / (stats[t][0] + 1.0)) + 1.0))
            for t in terms
            if t in stats
        }

    id_col = searcher.index.config.id_col
    text_col = searcher.index.config.text_col
    rows = top.df.join(
        searcher.corpus.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
        ),
        "doc_id",
    )

    def run(iterator):
        for pdf in iterator:
            nfs, scores, frags = [], [], []
            for txt in pdf["_text"]:
                nf, sc, fr = highlight_document(
                    txt,
                    trie,
                    frag_char_size,
                    max_num_fragments,
                    weighted,
                    term_weights,
                    score_order,
                    pre_tags,
                    post_tags,
                    margin,
                    boundary_max_scan,
                    phrase_limit,
                )
                nfs.append(nf)
                scores.append(np.float32(sc))
                frags.append(fr)
            out = pdf[["doc_id", "score"]].copy()
            out["n_frags"] = np.asarray(nfs, dtype=np.int32)
            out["frag_score"] = np.asarray(scores, dtype=np.float32)
            out["fragments"] = frags
            yield out

    return rows.mapInPandas(
        run,
        schema="doc_id bigint, score float, n_frags int, frag_score float, "
        "fragments array<string>",
    )
