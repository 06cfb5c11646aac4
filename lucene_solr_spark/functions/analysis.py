"""Analysis chain: tokenize → lowercase → stopword filter, batch-vectorized.

Re-implements the observable behavior of the reference analysis chain for
latin-script text:

- ``StandardTokenizer`` (UAX#29 word break, ``reference lucene/core/src/java/
  org/apache/lucene/analysis/standard/StandardTokenizer.java:44-73``),
  simplified to a regex word segmentation adequate for alphanumeric
  transcripts; tokens longer than ``max_token_length`` (default 255,
  ``StandardAnalyzer.java:39``) are skipped but still advance the position
  counter (``StandardTokenizer.java:142-166``);
- ``LowerCaseFilter`` (``analysis/LowerCaseFilter.java``) — we lowercase the
  whole string before segmentation, which is equivalent for a
  case-insensitive token regex;
- ``StopFilter`` (``analysis/StopFilter.java:28``) — removed tokens leave a
  position hole (``FilteringTokenFilter.java:48-56``); stopped / over-long
  tokens do NOT count toward the BM25 field length (norm), matching
  ``FieldInvertState`` length semantics (``index/FieldInvertState.java:38-43``);
- ``StandardAnalyzer()`` defaults to NO stopwords
  (``StandardAnalyzer.java:51-53``); ``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``
  is the classic 33-word list (``analysis/common/src/java/org/apache/lucene/
  analysis/en/EnglishAnalyzer.java:43-54``).

The same analyzer object is used at index time (inside Arrow UDF batches) and
at query time on the driver (``Analyzer.normalize``,
``StandardAnalyzer.java:92-95``) — a requirement for rank-identity.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

__all__ = ["Analyzer", "standard_analyzer", "simple_analyzer", "english_analyzer", "ENGLISH_STOP_WORDS"]

# analysis/en/EnglishAnalyzer.java:43-54 (classic 33-word English stop set)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# UAX#29-simplified word segmentation: unicode alnum runs, apostrophes kept
# word-internal (MidLetter), underscores are NOT word chars in UAX#29.
_STANDARD_PATTERN = r"[^\W_]+(?:['’][^\W_]+)*"
# ASCII-only lower-alnum runs — exactly reproducible in ANSI SQL
# (regexp_extract_all(lower(text), '[a-z0-9]+')), used for DuckDB-oracle parity.
_SIMPLE_PATTERN = r"[a-z0-9]+"


@dataclass(frozen=True)
class Analyzer:
    pattern: str = _STANDARD_PATTERN
    lowercase: bool = True
    stopwords: frozenset = field(default_factory=frozenset)
    max_token_length: int = 255

    def _regex(self) -> re.Pattern:
        return re.compile(self.pattern, re.UNICODE)

    def tokens(self, text: str) -> list[str]:
        """Analyze one string (driver-side / query normalization path)."""
        if text is None:
            return []
        if self.lowercase:
            text = text.lower()
        maxlen = self.max_token_length or None
        out = []
        for tok in self._regex().findall(text):
            if maxlen and len(tok) > maxlen:
                continue  # skipped but positions advance (not modeled here)
            if tok in self.stopwords:
                continue
            out.append(tok)
        return out

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(token, position) pairs; holes from stop/overlong tokens preserved
        (FilteringTokenFilter.java:48-56, StandardTokenizer.java:142-166)."""
        if text is None:
            return []
        if self.lowercase:
            text = text.lower()
        maxlen = self.max_token_length or None
        out = []
        for pos, tok in enumerate(self._regex().findall(text)):
            if (maxlen and len(tok) > maxlen) or tok in self.stopwords:
                continue
            out.append((tok, pos))
        return out

    def analyze_batch(self, texts: pd.Series):
        """Vectorized batch analysis for Arrow UDFs.

        Returns ``(flat_terms, row_index, dl)`` — see
        :meth:`analyze_batch_with_positions` for the position-carrying
        variant (DOCS_AND_FREQS_AND_POSITIONS).
        """
        flat, rows, dl, _ = self.analyze_batch_with_positions(texts)
        return flat, rows, dl

    def analyze_batch_with_positions(self, texts: pd.Series):
        """Vectorized batch analysis for Arrow UDFs.

        Returns ``(flat_terms, row_index, dl, positions)``:
        - ``flat_terms``: object ndarray of all kept tokens, document order;
        - ``row_index``: int64 ndarray, the batch row of each token;
        - ``dl``: int64 ndarray per batch row — kept-token count (the BM25
          field length; stopped/overlong tokens excluded, matching
          FieldInvertState length with discountOverlaps);
        - ``positions``: int64 ndarray per kept token — its token position
          within the document INCLUDING holes left by stopped/overlong
          tokens (FilteringTokenFilter.java:48-56 position increments).
        """
        s = texts.fillna("")
        if self.lowercase:
            s = s.str.lower()
        token_lists = s.str.findall(self._regex())
        counts = token_lists.str.len().to_numpy(dtype=np.int64)
        n_rows = len(s)
        if counts.sum() == 0:
            return (
                np.empty(0, dtype=object),
                np.empty(0, dtype=np.int64),
                np.zeros(n_rows, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
        flat = np.empty(int(counts.sum()), dtype=object)
        pos = 0
        for lst in token_lists:
            ln = len(lst)
            if ln:
                flat[pos : pos + ln] = lst
                pos += ln
        row_index = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        # token position within its document, BEFORE filtering (holes kept)
        starts = np.cumsum(counts) - counts
        positions = np.arange(flat.shape[0], dtype=np.int64) - np.repeat(starts, counts)

        keep = np.ones(flat.shape[0], dtype=bool)
        if self.max_token_length:
            lens = np.frompyfunc(len, 1, 1)(flat).astype(np.int64)
            keep &= lens <= self.max_token_length
        if self.stopwords:
            keep &= ~np.isin(flat, list(self.stopwords))
        flat = flat[keep]
        row_index = row_index[keep]
        positions = positions[keep]
        dl = np.bincount(row_index, minlength=n_rows).astype(np.int64)
        return flat, row_index, dl, positions


def standard_analyzer() -> Analyzer:
    """StandardAnalyzer-equivalent: UAX#29-ish + lowercase, no stopwords."""
    return Analyzer(pattern=_STANDARD_PATTERN, lowercase=True, stopwords=frozenset(), max_token_length=255)


def english_analyzer() -> Analyzer:
    """EnglishAnalyzer-equivalent stopword set (no stemming)."""
    return Analyzer(pattern=_STANDARD_PATTERN, lowercase=True, stopwords=ENGLISH_STOP_WORDS, max_token_length=255)


def simple_analyzer() -> Analyzer:
    """ASCII lower-alnum analyzer, bit-identical to the ANSI-SQL expression
    ``regexp_extract_all(lower(text), '[a-z0-9]+')`` — used for the DuckDB
    oracle parity path."""
    return Analyzer(pattern=_SIMPLE_PATTERN, lowercase=True, stopwords=frozenset(), max_token_length=0)
