"""UnifiedHighlighter with reference-exact passage scoring.

Reference: ``lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
PassageScorer.java`` (weight/tf/norm formulas + float32 cast points,
:82-142), ``FieldHighlighter.java`` (sentence BreakIterator passages, top-N
passage selection, no-highlight summary fallback, :55-185), and
``DefaultPassageFormatter.java`` (<b>/</b> wrapping, "... " ellipsis between
unconnected passages, :60-105).

Spark shape: a k-row post-pass — the winners' stored text joins in (the
two-phase GET_FIELDS fetch), then ONE ``mapInPandas`` computes passages,
scores, and formatted snippets per row; nothing distributed-heavy happens
here because only top-k rows ever reach this operator.

Float parity notes (PassageScorer.java):
- ``weight = f32((k1+1) · f32(ln(1 + (numDocs + 0.5) / (ttf + 0.5))))`` with
  ``numDocs = f32(1 + contentLen / pivot)`` (:82-90)
- ``tf = f32(freq / (freq + f32(k1·((1-b) + b·(passageLen/pivot)))))``
  (:99-103)
- ``norm = f32(1 + 1 / f32(ln(pivot + passageStart)))`` (:115-117)
- the reference accumulates the per-term products in float32 in hash order —
  unreproducible; we accumulate in float64 and cast once (deterministic,
  documented deviation), then multiply by ``norm`` in float32 (:138-141).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, functions as F

# ASCII-alnum runs on the ORIGINAL string: str.lower() on the whole text
# can change its length (e.g. 'İ' → 2 chars), shifting every later
# offset off the string the passages slice
_TOKEN_RE = re.compile(r"[a-zA-Z0-9]+")
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


@dataclass
class PassageScorer:
    """Exact port of ``PassageScorer.java`` (defaults k1=1.2 b=0.75 pivot=87
    — "typical average english sentence length", :55-61)."""

    k1: float = 1.2
    b: float = 0.75
    pivot: float = 87.0

    def weight(self, content_length: int, total_term_freq: int) -> np.float32:
        num_docs = np.float32(1) + np.float32(content_length) / np.float32(self.pivot)
        inner = np.log(1.0 + (float(num_docs) + 0.5) / (total_term_freq + 0.5))
        return np.float32(np.float32(self.k1 + 1) * np.float32(inner))

    def tf(self, freq: int, passage_len: int) -> np.float32:
        norm = np.float32(self.k1) * np.float32(
            np.float32(1 - self.b)
            + np.float32(self.b) * (np.float32(passage_len) / np.float32(self.pivot))
        )
        return np.float32(np.float32(freq) / (np.float32(freq) + norm))

    def norm(self, passage_start: int) -> np.float32:
        return np.float32(
            np.float32(1) + np.float32(1) / np.float32(np.log(self.pivot + passage_start))
        )

    def score(self, term_freqs_in_passage: dict, term_freqs_in_doc: dict,
              passage_start: int, passage_len: int, content_length: int) -> np.float32:
        total = np.float64(0.0)
        for t in sorted(term_freqs_in_passage):
            total += np.float64(
                np.float32(
                    self.tf(term_freqs_in_passage[t], passage_len)
                    * self.weight(content_length, term_freqs_in_doc[t])
                )
            )
        return np.float32(np.float32(total) * self.norm(passage_start))


def _sentences(text: str) -> list[tuple[int, int]]:
    """(start, end) char spans — sentence BreakIterator stand-in: split after
    [.!?]+whitespace; the whole text when no boundary exists.  Like
    ``BreakIterator.getSentenceInstance``, a sentence span INCLUDES its
    trailing whitespace (the reference's snippet literals end in a space:
    ``TestUnifiedHighlighter.testBasics`` expects "Just a test
    <b>highlighting</b> from postings. ")."""
    spans, pos = [], 0
    for m in _SENT_RE.finditer(text):
        spans.append((pos, m.end()))
        pos = m.end()
    if pos < len(text):
        spans.append((pos, len(text)))
    return spans or [(0, 0)]


def _highlight_one(text: str, terms: set, scorer: PassageScorer, max_passages: int):
    """(score_of_best, formatted_snippet) for one document."""
    occurrences = [
        (m.start(), m.end(), m.group().lower())
        for m in _TOKEN_RE.finditer(text)
        if m.group().lower() in terms
    ]
    if not occurrences:
        # getSummaryPassagesNoHighlight: first sentence(s), score 0
        spans = _sentences(text)[:max_passages]
        return 0.0, " ".join(text[s:e] for s, e in spans)
    tf_doc: dict = {}
    for _, _, t in occurrences:
        tf_doc[t] = tf_doc.get(t, 0) + 1
    content_len = len(text)
    passages = []
    for s, e in _sentences(text):
        in_p = [(a, b, t) for a, b, t in occurrences if s <= a and b <= e]
        if not in_p:
            continue
        tf_p: dict = {}
        for _, _, t in in_p:
            tf_p[t] = tf_p.get(t, 0) + 1
        sc = scorer.score(tf_p, tf_doc, s, e - s, content_len)
        passages.append((float(sc), s, e, in_p))
    # top-N by score (min-heap analog), then document order for formatting
    best = sorted(passages, key=lambda p: (-p[0], p[1]))[:max_passages]
    best.sort(key=lambda p: p[1])
    # DefaultPassageFormatter: "<b>match</b>", "... " between unconnected
    parts, pos = [], -1
    for _, s, e, in_p in best:
        if parts and s != pos:
            parts.append("... ")
        cur = s
        for a, b, _ in in_p:
            if a < cur:
                continue  # overlapping match (repeated term) already emitted
            parts.append(text[cur:a])
            parts.append("<b>")
            parts.append(text[a:b])
            parts.append("</b>")
            cur = b
        parts.append(text[cur:e])
        pos = e
    return max(p[0] for p in best), "".join(parts)


def unified_highlight(
    searcher,
    top,
    terms,
    max_passages: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
    max_length: int | None = None,
) -> DataFrame:
    """Highlight the top-k winners: fetch their stored text (broadcast
    semi-join, the GET_FIELDS phase) and produce ``(doc_id, score,
    hl_score, snippet)`` via one Arrow batch pass.

    ``terms`` is a term list or a Query — a Query highlights its extracted
    terms (``UnifiedHighlighter.extractTerms``; phrase/boolean terms
    highlight individually, the re-analysis offset strategy's behavior).

    ``max_length`` is UnifiedHighlighter.setMaxLength: content is truncated
    to that many chars BEFORE analysis, so a match whose span crosses the
    cut is not highlighted (LUCENE-5166 — the truncated partial token no
    longer equals the query term).  None = no truncation (the reference
    defaults to 10000; kept opt-in here so existing oracles replaying full
    stored text stay exact)."""
    if searcher.corpus is None:
        raise ValueError("unified_highlight needs IndexSearcher(corpus=...)")
    id_col = searcher.index.config.id_col
    text_col = searcher.index.config.text_col
    scorer = PassageScorer(k1, b, pivot)
    from ..plans.query import Query as _Q

    tset = set(terms.terms()) if isinstance(terms, _Q) else set(terms)
    rows = top.df.join(
        searcher.corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")),
        "doc_id",
    )

    def run(iterator):
        for pdf in iterator:
            hs, snips = [], []
            for txt in pdf["_text"]:
                if max_length is not None:
                    txt = txt[:max_length]
                sc, snip = _highlight_one(txt, tset, scorer, max_passages)
                hs.append(np.float32(sc))
                snips.append(snip)
            out = pdf[["doc_id", "score"]].copy()
            out["hl_score"] = np.asarray(hs, dtype=np.float32)
            out["snippet"] = snips
            yield out

    return rows.mapInPandas(
        run, schema="doc_id bigint, score float, hl_score float, snippet string"
    )
