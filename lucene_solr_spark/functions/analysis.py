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

__all__ = [
    "Analyzer",
    "standard_analyzer",
    "simple_analyzer",
    "english_analyzer",
    "english_analyzer_porter",
    "cjk_analyzer",
    "shingle_analyzer",
    "synonym_analyzer",
    "wdgf_analyzer",
    "ENGLISH_STOP_WORDS",
]

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

# CJK script ranges the reference bigrams by default (``analysis/cjk/
# CJKBigramFilter.java:113-116``: HAN | HIRAGANA | KATAKANA | HANGUL):
# Hangul jamo, Hiragana+Katakana (+phonetic ext), CJK ext-A, unified Han,
# Hangul syllables, compat ideographs.
_CJK_RANGES = (
    "ᄀ-ᇿ぀-ヿㇰ-ㇿ㐀-䶿"
    "一-鿿가-힯豈-﫿"
)
# CJK runs tokenize as one run (bigrammed downstream); latin words must NOT
# absorb adjacent CJK chars (StandardTokenizer script-splits via UAX#29), so
# the word alternative excludes the CJK ranges explicitly.
_CJK_PATTERN = (
    rf"[{_CJK_RANGES}]+"
    rf"|[^\W_{_CJK_RANGES}]+(?:['’][^\W_{_CJK_RANGES}]+)*"
)
_CJK_RUN_RE = re.compile(rf"[{_CJK_RANGES}]")


@dataclass(frozen=True)
class Analyzer:
    pattern: str = _STANDARD_PATTERN
    lowercase: bool = True
    stopwords: frozenset = field(default_factory=frozenset)
    max_token_length: int = 255
    # EnglishPossessiveFilter (``reference lucene/analysis/common/src/java/
    # org/apache/lucene/analysis/en/EnglishPossessiveFilter.java:45-50``):
    # strip a trailing {' ’ ＇}s before the stop filter sees the token
    strip_possessive: bool = False
    # Stemming filter, applied AFTER the stop filter (EnglishAnalyzer.java:
    # 103-110 chain order): None, "porter" (PorterStemFilter), or
    # "minimal_english" (EnglishMinimalStemFilter / Harman S-stemmer)
    stemmer: str | None = None
    # CJKBigramFilter (``reference lucene/analysis/common/src/java/org/apache/
    # lucene/analysis/cjk/CJKBigramFilter.java``): a contiguous CJK run of n
    # chars emits its n-1 overlapping character bigrams (posIncrement 1 each);
    # a lone CJK char emits a unigram (the filter's SINGLE_TYPE fallback).
    # Requires a script-splitting pattern (use :func:`cjk_analyzer`).
    cjk_bigrams: bool = False
    # ASCIIFoldingFilter (``reference lucene/analysis/common/src/java/org/
    # apache/lucene/analysis/miscellaneous/ASCIIFoldingFilter.java``): fold
    # Unicode Latin/punctuation variants to ASCII, applied per token AFTER
    # the possessive strip and BEFORE the stop filter (so 'thé' folds to
    # 'the' and can stop out).  Codepoints < U+0080 never fold, so the
    # byte-level encoded fast path (which only accepts pure-ASCII batches)
    # remains bit-identical with folding enabled.
    ascii_folding: bool = False
    # SynonymGraphFilter in single-token replace mode (``reference lucene/
    # analysis/common/src/java/org/apache/lucene/analysis/synonym/
    # SynonymGraphFilter.java`` with SolrSynonymParser `a => b` rules,
    # keepOrig = false): each token is rewritten through the map AFTER the
    # stop/stem filters; positions and field length are unchanged (1:1).
    # Tuple of (token, replacement) pairs (hashable for the frozen dataclass).
    token_map: tuple = ()
    # ShingleFilter (``reference lucene/analysis/common/src/java/org/apache/
    # lucene/analysis/shingle/ShingleFilter.java``) with min=max=2 and
    # outputUnigrams: each adjacent token pair additionally emits the
    # space-joined word bigram at the FIRST token's position (posIncrement 0,
    # i.e. an overlap token — it does not count toward the BM25 field length,
    # matching discountOverlaps norm semantics).  Only hole-free chains are
    # supported (no stopwords / overlong-token skips): the reference inserts
    # '_' filler tokens across holes, which we do not model.  DEVIATION from
    # Lucene: our sumTotalTermFreq (hence avgdl) also excludes the overlap
    # tokens, keeping per-doc and collection length on the same definition;
    # Lucene derives sumTotalTermFreq from postings so shingles inflate its
    # avgdl while norms discount them.
    shingles: bool = False
    # NGramTokenFilter / EdgeNGramTokenFilter (``reference lucene/analysis/
    # common/src/java/org/apache/lucene/analysis/ngram/NGramTokenFilter.java``,
    # ``EdgeNGramTokenFilter.java``): each kept token decomposes into its
    # [min_gram, max_gram] character n-grams (all offsets, sizes ascending
    # per offset; edge = prefixes only).  All grams of one source token sit
    # at the SOURCE position (the filters stopped advancing positions in
    # LUCENE-7960), so exactly one gram per emitting token counts toward the
    # BM25 field length (discountOverlaps); a token that emits nothing
    # (shorter than min_gram without preserve_original) contributes 0.
    # Tuple (min_gram, max_gram) or (min_gram, max_gram, preserve_original).
    ngrams: tuple = ()
    edge_ngrams: tuple = ()
    # LengthFilter (``reference lucene/analysis/common/src/java/org/apache/
    # lucene/analysis/miscellaneous/LengthFilter.java``): keep tokens with
    # min <= length <= max; a FilteringTokenFilter, so dropped tokens leave
    # position holes exactly like stopwords. Tuple (min_len, max_len).
    length_filter: tuple = ()
    # CommonGramsFilter (``reference lucene/analysis/common/src/java/org/
    # apache/lucene/analysis/commongrams/CommonGramsFilter.java``): for each
    # adjacent pair where either side is a common word, additionally emit the
    # '_'-joined bigram at the FIRST token's position with posIncrement 0
    # (:42,72-98) — an overlap token, discounted from the field length like
    # shingles. Tuple of common words. ``common_grams_query`` applies the
    # CommonGramsQueryFilter view (query-time only): unigrams that are a
    # member of >= 1 emitted gram are dropped, grams and lone unigrams kept
    # (CommonGramsQueryFilter.java:28-40 example).
    common_grams: tuple = ()
    common_grams_query: bool = False
    # PatternReplaceFilter (``reference lucene/analysis/common/src/java/org/
    # apache/lucene/analysis/pattern/PatternReplaceFilter.java``): regex
    # replace within each token (replaceAll when all=True, replaceFirst
    # otherwise); strictly 1:1, so positions and field length are unchanged.
    # Tuple (regex, replacement) or (regex, replacement, all). Applied after
    # the stop filter, before stem/synonym (PatternReplaceFilterFactory's
    # usual chain spot). Tokens replaced to '' are kept as empty terms by the
    # reference; we mirror that (they still count toward dl).
    pattern_replace: tuple = ()
    # TruncateTokenFilter (``reference lucene/analysis/common/src/java/org/
    # apache/lucene/analysis/miscellaneous/TruncateTokenFilter.java``): cap
    # every non-keyword token at this many leading characters (1:1, positions
    # and field length unchanged); keyword_terms are exempt (the filter
    # honors KeywordAttribute). 0 = off.
    truncate: int = 0
    # ElisionFilter (``reference lucene/analysis/common/src/java/org/apache/
    # lucene/analysis/util/ElisionFilter.java:51-70``): when a token contains
    # an apostrophe (' or U+2019) and the prefix before the FIRST apostrophe
    # is a listed article, strip prefix + apostrophe (l'avion -> avion).
    # FrenchAnalyzer.DEFAULT_ARTICLES via ``french_elision_articles()``. 1:1.
    elision: tuple = ()
    # KeywordMarkerFilter (``.../miscellaneous/SetKeywordMarkerFilter.java``):
    # terms in this set bypass the stemmer (KeywordAttribute contract the
    # stem filters honor). Tuple of protected terms (hashable).
    keyword_terms: tuple = ()
    # WordDelimiterGraphFilter (``reference lucene/analysis/common/src/java/
    # org/apache/lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java``,
    # see functions/worddelimiter.py): int flag mask; when nonzero the chain
    # becomes whitespace-tokenize (ORIGINAL case — the filter splits on case
    # transitions, so it must run before LowerCaseFilter) → WDGF → lowercase.
    # Catenations/preserved originals are posIncrement-0 overlap tokens at
    # their span's start position and do not count toward the field length
    # (discountOverlaps); a token of pure delimiters is swallowed, leaving a
    # position hole. Use :func:`wdgf_analyzer`.
    word_delimiter: int = 0
    # WDGF protWords (protected from delimiting; CharArraySet in the ref)
    protected_words: tuple = ()

    def __post_init__(self):
        if self.shingles and (self.stopwords or self.max_token_length):
            raise ValueError(
                "shingles require a hole-free chain (no stopwords, "
                "max_token_length=0); filler tokens are not modeled"
            )
        if self.ngrams and self.edge_ngrams:
            raise ValueError("ngrams and edge_ngrams are mutually exclusive")
        if (self.ngrams or self.edge_ngrams) and (self.shingles or self.cjk_bigrams):
            raise ValueError("n-gram filters do not compose with shingles/cjk_bigrams")
        if self.common_grams and (self.shingles or self.ngrams or self.edge_ngrams):
            raise ValueError("common_grams do not compose with shingle/n-gram filters")
        if self.common_grams and (self.stopwords or self.max_token_length or self.length_filter):
            raise ValueError(
                "common_grams require a hole-free chain (common words must survive "
                "to pair; filler tokens are not modeled)"
            )
        if self.common_grams_query and not self.common_grams:
            raise ValueError("common_grams_query requires common_grams")
        for g in (self.ngrams, self.edge_ngrams):
            if g and not (1 <= int(g[0]) <= int(g[1])):
                # NGramTokenFilter.java ctor: minGram >= 1, minGram <= maxGram
                raise ValueError("require 1 <= min_gram <= max_gram")
        if self.word_delimiter:
            from .worddelimiter import _VALID_FLAGS

            if self.word_delimiter & ~_VALID_FLAGS:
                # WordDelimiterGraphFilter.java ctor flag validation (:228-243)
                raise ValueError("word_delimiter contains unrecognized flag")
            incompatible = (
                self.stopwords or self.strip_possessive or self.stemmer
                or self.cjk_bigrams or self.ascii_folding or self.token_map
                or self.shingles or self.ngrams or self.edge_ngrams
                or self.length_filter or self.common_grams or self.pattern_replace
                or self.truncate or self.elision
            )
            if incompatible:
                raise ValueError(
                    "word_delimiter composes only with lowercase/"
                    "max_token_length (graph positions vs downstream filter "
                    "holes are not modeled)"
                )

    def _gram_expand(self, tok: str) -> list[str]:
        """Gram emission for one token, in the reference's state-machine
        order (per offset, sizes ascending; edge = offset 0 only); the
        preserved original (when out of [min, max]) follows the grams."""
        spec = self.ngrams or self.edge_ngrams
        mn, mx = int(spec[0]), int(spec[1])
        preserve = len(spec) > 2 and bool(spec[2])
        n = len(tok)
        out = []
        last_pos = 0 if self.edge_ngrams else max(n - mn, 0)
        for pos in range(0, last_pos + 1):
            if pos + mn > n:
                break
            for size in range(mn, mx + 1):
                if pos + size > n:
                    break
                out.append(tok[pos : pos + size])
        if preserve and (n < mn or n > mx):
            out.append(tok)
        return out

    def _expand_cjk(self, tok: str) -> list[str]:
        if not _CJK_RUN_RE.match(tok) or len(tok) == 1:
            return [tok]
        return [tok[i : i + 2] for i in range(len(tok) - 1)]

    def _expand_cjk_list(self, toks: list[str]) -> list[str]:
        out: list[str] = []
        for t in toks:
            out.extend(self._expand_cjk(t))
        return out

    def _regex(self) -> re.Pattern:
        return re.compile(self.pattern, re.UNICODE)

    def _elide(self, tok: str) -> str:
        for i, ch in enumerate(tok):
            if ch == "'" or ch == "\u2019":
                if tok[:i] in self.elision:
                    return tok[i + 1 :]
                return tok
        return tok

    def _truncate(self, tok: str) -> str:
        if self.keyword_terms and tok in self.keyword_terms:
            return tok  # KeywordAttribute exemption
        return tok[: self.truncate]

    def _pat_replace(self, tok: str) -> str:
        rx = re.compile(self.pattern_replace[0])
        repl = self.pattern_replace[1]
        if len(self.pattern_replace) > 2 and not self.pattern_replace[2]:
            return rx.sub(repl, tok, count=1)  # replaceFirst
        return rx.sub(repl, tok)  # replaceAll (the reference default)

    def _strip_poss(self, tok: str) -> str:
        if len(tok) >= 2 and tok[-1] in "sS" and tok[-2] in "'’＇":
            return tok[:-2]
        return tok

    def _stem(self, tok: str) -> str:
        if self.keyword_terms and tok in self.keyword_terms:
            return tok  # KeywordMarkerFilter: protected from stemming
        if self.stemmer == "porter":
            from .porterstem import porter_stem

            return porter_stem(tok)
        if self.stemmer == "minimal_english":
            from .porterstem import s_stem

            return s_stem(tok)
        return tok

    def _syn_map(self) -> dict:
        return dict(self.token_map)

    @staticmethod
    def _fold(tok: str) -> str:
        if tok.isascii():
            return tok
        from .folding_data import FOLD_MAP

        return "".join(FOLD_MAP.get(ch, ch) for ch in tok)

    def normalize(self, text: str) -> str:
        """``Analyzer.normalize`` (``StandardAnalyzer.java:92-95``): the
        query-time term normalization path — the normalization-capable
        filters only (lowercase, ASCII folding), NO tokenization/stemming.
        Used by multi-term query construction (prefix/fuzzy/wildcard)."""
        if text is None:
            return ""
        if self.lowercase:
            text = text.lower()
        if self.ascii_folding:
            text = self._fold(text)
        return text

    def _wdgf_stream(self, text: str) -> list[tuple[str, int]]:
        """Whitespace-tokenize ORIGINAL-case text, run WordDelimiterGraph-
        Filter per token, lowercase the parts; positions follow the graph
        (catenations at their span's start position, swallowed tokens leave
        a one-position hole)."""
        from .worddelimiter import word_delimiter_parts

        if text is None:
            return []
        prot = frozenset(self.protected_words)
        maxlen = self.max_token_length or None
        base = 0
        out: list[tuple[str, int]] = []
        for raw in self._regex().findall(text):
            if maxlen and len(raw) > maxlen:
                base += 1  # overlong token skipped; position hole
                continue
            parts, npos = word_delimiter_parts(raw, self.word_delimiter, prot)
            for term, sp in parts:
                out.append((term.lower() if self.lowercase else term, base + sp))
            base += npos
        return out

    def tokens(self, text: str) -> list[str]:
        """Analyze one string (driver-side / query normalization path)."""
        if text is None:
            return []
        if self.word_delimiter:
            return [t for t, _ in self._wdgf_stream(text)]
        if self.lowercase:
            text = text.lower()
        maxlen = self.max_token_length or None
        out = []
        toks = self._regex().findall(text)
        if self.cjk_bigrams:
            toks = self._expand_cjk_list(toks)
        for tok in toks:
            if maxlen and len(tok) > maxlen:
                continue
            if self.length_filter and not (self.length_filter[0] <= len(tok) <= self.length_filter[1]):
                continue  # LengthFilter hole (position-preserving)  # skipped but positions advance (not modeled here)
            if self.elision:
                tok = self._elide(tok)
            if self.strip_possessive:
                tok = self._strip_poss(tok)
            if self.ascii_folding:
                tok = self._fold(tok)
            if tok in self.stopwords:
                continue
            if self.pattern_replace:
                tok = self._pat_replace(tok)
            if self.truncate:
                tok = self._truncate(tok)
            out.append(self._stem(tok))
        if self.token_map:
            m = self._syn_map()
            out = [m.get(t, t) for t in out]
        if self.shingles:
            out = out + [f"{a} {b}" for a, b in zip(out, out[1:])]
        if self.ngrams or self.edge_ngrams:
            out = [g for t in out for g in self._gram_expand(t)]
        if self.common_grams:
            cset = set(self.common_grams)
            qual = [a in cset or b in cset for a, b in zip(out, out[1:])]
            if self.common_grams_query:
                # CommonGramsQueryFilter: keep grams; drop unigrams that are
                # a member of any gram
                new = []
                for i, t in enumerate(out):
                    if i < len(qual) and qual[i]:
                        new.append(f"{t}_{out[i + 1]}")
                    if not ((i > 0 and qual[i - 1]) or (i < len(qual) and qual[i])):
                        new.append(t)
                out = new
            else:
                merged = []
                for i, t in enumerate(out):
                    merged.append(t)
                    if i < len(qual) and qual[i]:
                        merged.append(f"{t}_{out[i + 1]}")
                out = merged
        return out

    def tokens_with_positions(self, text: str) -> list[tuple[str, int]]:
        """(token, position) pairs; holes from stop/overlong tokens preserved
        (FilteringTokenFilter.java:48-56, StandardTokenizer.java:142-166)."""
        if text is None:
            return []
        if self.word_delimiter:
            return self._wdgf_stream(text)
        if self.lowercase:
            text = text.lower()
        maxlen = self.max_token_length or None
        out = []
        toks = self._regex().findall(text)
        if self.cjk_bigrams:
            toks = self._expand_cjk_list(toks)
        for pos, tok in enumerate(toks):
            if maxlen and len(tok) > maxlen:
                continue
            if self.length_filter and not (self.length_filter[0] <= len(tok) <= self.length_filter[1]):
                continue  # LengthFilter hole (position-preserving)
            if self.elision:
                tok = self._elide(tok)
            if self.strip_possessive:
                tok = self._strip_poss(tok)
            if self.ascii_folding:
                tok = self._fold(tok)
            if tok in self.stopwords:
                continue
            if self.pattern_replace:
                tok = self._pat_replace(tok)
            if self.truncate:
                tok = self._truncate(tok)
            out.append((self._stem(tok), pos))
        if self.token_map:
            m = self._syn_map()
            out = [(m.get(t, t), p) for t, p in out]
        if self.shingles:
            # shingle at the first token's position, emitted after its unigram
            merged = []
            for i, (t, p) in enumerate(out):
                merged.append((t, p))
                if i + 1 < len(out):
                    merged.append((f"{t} {out[i + 1][0]}", p))
            out = merged
        if self.ngrams or self.edge_ngrams:
            out = [(g, p) for t, p in out for g in self._gram_expand(t)]
        if self.common_grams and not self.common_grams_query:
            cset = set(self.common_grams)
            merged = []
            for i, (t, p) in enumerate(out):
                merged.append((t, p))
                if i + 1 < len(out) and (t in cset or out[i + 1][0] in cset):
                    merged.append((f"{t}_{out[i + 1][0]}", p))
            out = merged
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
        if self.word_delimiter:
            return self._analyze_batch_wdgf(texts)
        s = texts.fillna("")
        if self.lowercase:
            s = s.str.lower()
        token_lists = s.str.findall(self._regex())
        if self.cjk_bigrams:
            token_lists = token_lists.map(self._expand_cjk_list)
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
        if self.max_token_length or self.length_filter:
            lens = np.frompyfunc(len, 1, 1)(flat).astype(np.int64)
            if self.max_token_length:
                keep &= lens <= self.max_token_length
            if self.length_filter:
                keep &= (lens >= self.length_filter[0]) & (lens <= self.length_filter[1])
        if self.elision and flat.size:
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([self._elide(u) for u in uniques], dtype=object)[codes]
        if self.strip_possessive:
            # transform on the batch dictionary, gather back (tokens are
            # heavily repeated; the dictionary is small)
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([self._strip_poss(u) for u in uniques], dtype=object)[codes]
        if self.ascii_folding and flat.size:
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([self._fold(u) for u in uniques], dtype=object)[codes]
        if self.stopwords:
            keep &= ~np.isin(flat, list(self.stopwords))
        flat = flat[keep]
        row_index = row_index[keep]
        positions = positions[keep]
        if self.pattern_replace and flat.size:
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([self._pat_replace(u) for u in uniques], dtype=object)[codes]
        if self.truncate and flat.size:
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([self._truncate(u) for u in uniques], dtype=object)[codes]
        if self.stemmer is not None and flat.size:
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([self._stem(u) for u in uniques], dtype=object)[codes]
        if self.token_map and flat.size:
            m = self._syn_map()
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            flat = np.array([m.get(u, u) for u in uniques], dtype=object)[codes]
        # field length BEFORE shingle expansion: shingles are posIncrement-0
        # overlap tokens and do not count (discountOverlaps)
        dl = np.bincount(row_index, minlength=n_rows).astype(np.int64)
        if self.shingles and flat.size > 1:
            adj = (row_index[1:] == row_index[:-1]) & (positions[1:] == positions[:-1] + 1)
            if adj.any():
                left = pd.Series(flat[:-1][adj], dtype=object)
                right = pd.Series(flat[1:][adj], dtype=object)
                big = left.str.cat(right, sep=" ").to_numpy(dtype=object)
                flat = np.concatenate([flat, big])
                row_index = np.concatenate([row_index, row_index[:-1][adj]])
                positions = np.concatenate([positions, positions[:-1][adj]])
                # restore document order; stable lexsort keeps each unigram
                # ahead of the shingle sharing its (row, position)
                order = np.lexsort((positions, row_index))
                flat, row_index, positions = flat[order], row_index[order], positions[order]
        if self.common_grams and flat.size > 1:
            if self.common_grams_query:
                raise NotImplementedError("common_grams_query is a query-time view (use tokens())")
            cset = list(self.common_grams)
            adj = (row_index[1:] == row_index[:-1]) & (positions[1:] == positions[:-1] + 1)
            qual = adj & (np.isin(flat[:-1], cset) | np.isin(flat[1:], cset))
            if qual.any():
                left = pd.Series(flat[:-1][qual], dtype=object)
                right = pd.Series(flat[1:][qual], dtype=object)
                gram = left.str.cat(right, sep="_").to_numpy(dtype=object)
                flat = np.concatenate([flat, gram])
                row_index = np.concatenate([row_index, row_index[:-1][qual]])
                positions = np.concatenate([positions, positions[:-1][qual]])
                order = np.lexsort((positions, row_index))
                flat, row_index, positions = flat[order], row_index[order], positions[order]
        if (self.ngrams or self.edge_ngrams) and flat.size:
            # expand through the batch dictionary (tokens repeat heavily);
            # every gram inherits its source token's (row, position)
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            gram_lists = [self._gram_expand(u) for u in uniques]
            glens = np.array([len(g) for g in gram_lists], dtype=np.int64)
            all_grams = np.empty(int(glens.sum()), dtype=object)
            w = 0
            for lst in gram_lists:
                all_grams[w : w + len(lst)] = lst
                w += len(lst)
            offs = np.cumsum(glens) - glens
            reps = glens[codes]
            idx = np.repeat(offs[codes], reps) + (
                np.arange(int(reps.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(reps) - reps, reps)
            )
            # dl: one countable (posIncr-carrying) gram per EMITTING token
            dl = np.bincount(row_index[reps > 0], minlength=n_rows).astype(np.int64)
            flat = all_grams[idx]
            row_index = np.repeat(row_index, reps)
            positions = np.repeat(positions, reps)
        return flat, row_index, dl, positions

    def _analyze_batch_wdgf(self, texts: pd.Series):
        """Batch WordDelimiterGraphFilter analysis: whitespace tokens of the
        ORIGINAL-case text expand through the (small) batch dictionary — the
        Python WDGF kernel runs once per distinct raw token; occurrences
        expand with numpy gathers.  dl counts one token per occupied graph
        position (catenations/preserved originals are posIncrement-0
        overlaps, discounted; swallowed tokens advance positions but add no
        length)."""
        from .worddelimiter import word_delimiter_parts

        s = texts.fillna("")
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
        flat_raw = np.empty(int(counts.sum()), dtype=object)
        w = 0
        for lst in token_lists:
            if lst:
                flat_raw[w : w + len(lst)] = lst
                w += len(lst)
        row_index = np.repeat(np.arange(n_rows, dtype=np.int64), counts)

        codes, uniques = pd.factorize(pd.Series(flat_raw), sort=False)
        prot = frozenset(self.protected_words)
        maxlen = self.max_token_length or None
        part_lists: list[list] = []
        npos_u = np.empty(len(uniques), dtype=np.int64)
        dl_u = np.empty(len(uniques), dtype=np.int64)
        for i, u in enumerate(uniques):
            if maxlen and len(u) > maxlen:
                parts, npos = [], 1  # overlong: skipped, position hole
            else:
                parts, npos = word_delimiter_parts(u, self.word_delimiter, prot)
            if self.lowercase:
                parts = [(t.lower(), sp) for t, sp in parts]
            part_lists.append(parts)
            npos_u[i] = npos
            dl_u[i] = len({sp for _, sp in parts})

        # per-occurrence position base: exclusive prefix sum of the occupied
        # position counts, rebased to each row's first occurrence
        npos_occ = npos_u[codes]
        total_before = np.cumsum(npos_occ) - npos_occ
        starts = np.cumsum(counts) - counts
        base_within = total_before - total_before[np.repeat(starts, counts)]

        # expand emissions through the dictionary (numpy gather)
        emit_u = np.array([len(p) for p in part_lists], dtype=np.int64)
        all_terms = np.empty(int(emit_u.sum()), dtype=object)
        all_sp = np.empty(int(emit_u.sum()), dtype=np.int64)
        w = 0
        for parts in part_lists:
            for t, sp in parts:
                all_terms[w] = t
                all_sp[w] = sp
                w += 1
        offs_u = np.cumsum(emit_u) - emit_u
        reps = emit_u[codes]
        idx = np.repeat(offs_u[codes], reps) + (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        flat = all_terms[idx]
        positions = np.repeat(base_within, reps) + all_sp[idx]
        out_rows = np.repeat(row_index, reps)
        dl = np.bincount(
            row_index, weights=dl_u[codes].astype(np.float64), minlength=n_rows
        ).astype(np.int64)
        return flat, out_rows, dl, positions

    # ------------------------------------------------- encoded (hot) path
    def analyze_batch_encoded(self, texts: pd.Series):
        """Batch analysis returning dictionary-encoded terms:
        ``(term_codes, uniques, row_index, dl, positions)`` where
        ``uniques`` is a sorted object array of term strings and
        ``term_codes[i]`` indexes into it (identical to
        ``pd.factorize(flat, sort=True)`` of the flat token stream).

        For pure-ASCII batches of the standard/simple patterns this runs a
        byte-level numpy tokenizer that never materializes per-token Python
        strings — the index-build hot path at 10^12-turn scale is exactly
        this loop, and per-token PyObjects are what saturate the memory bus
        when 16+ workers share one node.  Any other input falls back to the
        regex path (bit-identical results, property-tested).
        """
        fast = self._encode_ascii_batch(texts)
        if fast is not None:
            return fast
        flat, rows, dl, positions = self.analyze_batch_with_positions(texts)
        codes, uniques = pd.factorize(pd.Series(flat), sort=True)
        return (
            codes.astype(np.int64),
            uniques.to_numpy(dtype=object),
            rows,
            dl,
            positions,
        )

    _FAST_MAX_TOKEN_BYTES = 32

    def _encode_ascii_batch(self, texts: pd.Series):
        """Vectorized ASCII tokenizer; None when the batch needs the regex
        fallback (non-ASCII text, NUL bytes, unsupported pattern, or a kept
        token longer than the fixed-width dictionary bound)."""
        if (
            self.strip_possessive
            or self.stemmer is not None
            or self.token_map
            or self.shingles
            or self.ngrams
            or self.edge_ngrams
            or self.common_grams
            or self.pattern_replace
            or self.truncate
            or self.elision
            or self.word_delimiter
        ):
            return None  # token-transform chains take the regex path
        if self.pattern == _STANDARD_PATTERN:
            apostrophe_joins = True
        elif self.pattern == _SIMPLE_PATTERN:
            apostrophe_joins = False
        else:
            return None
        vals = texts.fillna("").tolist()
        n_rows = len(vals)
        joined = "\x00".join(vals)
        if not joined.isascii() or joined.count("\x00") != n_rows - 1:
            return None

        arr = np.frombuffer(joined.encode(), dtype=np.uint8).copy()
        if arr.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=object), e, np.zeros(n_rows, dtype=np.int64), e
        if self.lowercase:
            up = (arr >= 65) & (arr <= 90)
            arr[up] += 32
        # word chars per [^\W_] on ASCII: a-z 0-9 (A-Z when not lowercasing)
        w = ((arr >= 97) & (arr <= 122)) | ((arr >= 48) & (arr <= 57))
        if not self.lowercase:
            w |= (arr >= 65) & (arr <= 90)
        if apostrophe_joins:
            # ' joins iff both neighbors are word chars (MidLetter rule)
            a = arr == 39
            prev_w = np.empty_like(w)
            prev_w[0] = False
            prev_w[1:] = w[:-1]
            next_w = np.empty_like(w)
            next_w[-1] = False
            next_w[:-1] = w[1:]
            eff = w | (a & prev_w & next_w)
        else:
            eff = w
        prev_eff = np.empty_like(eff)
        prev_eff[0] = False
        prev_eff[1:] = eff[:-1]
        starts = np.flatnonzero(eff & ~prev_eff)
        if starts.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=object), e, np.zeros(n_rows, dtype=np.int64), e
        next_eff = np.empty_like(eff)
        next_eff[-1] = False
        next_eff[:-1] = eff[1:]
        ends = np.flatnonzero(eff & ~next_eff) + 1
        lens = ends - starts

        seps = np.flatnonzero(arr == 0)
        row_index = np.searchsorted(seps, starts, side="left").astype(np.int64)
        tok_per_row = np.bincount(row_index, minlength=n_rows).astype(np.int64)
        row_first = np.cumsum(tok_per_row) - tok_per_row
        positions = np.arange(starts.size, dtype=np.int64) - np.repeat(row_first, tok_per_row)

        keep = np.ones(starts.size, dtype=bool)
        if self.max_token_length:
            keep &= lens <= self.max_token_length
        if self.length_filter:
            keep &= (lens >= self.length_filter[0]) & (lens <= self.length_filter[1])
        starts, lens, row_index, positions = starts[keep], lens[keep], row_index[keep], positions[keep]
        n_tok = starts.size
        if n_tok == 0:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=object), e, np.zeros(n_rows, dtype=np.int64), e
        width = int(lens.max())
        if width > self._FAST_MAX_TOKEN_BYTES:
            return None  # rare giant tokens: keep the dictionary fixed-width

        # fixed-width dictionary encode: pad tokens into an (n, width) byte
        # matrix (one vectorized gather per byte column), then np.unique on
        # the void view — sorted uniques + dense codes, no PyObjects
        padded = np.zeros((n_tok, width), dtype=np.uint8)
        for j in range(width):
            m = lens > j
            padded[m, j] = arr[starts[m] + j]
        keys = padded.reshape(n_tok * width).view(np.dtype((np.void, width)))
        uniq_keys, codes = np.unique(keys, return_inverse=True)
        codes = codes.astype(np.int64)
        uniques = np.array(
            [bytes(k).rstrip(b"\x00").decode() for k in uniq_keys], dtype=object
        )

        if self.stopwords:
            stop_codes = np.flatnonzero(np.isin(uniques, list(self.stopwords)))
            if stop_codes.size:
                keep_sw = ~np.isin(codes, stop_codes)
                codes, row_index, positions = codes[keep_sw], row_index[keep_sw], positions[keep_sw]
                live, codes = np.unique(codes, return_inverse=True)
                codes = codes.astype(np.int64)
                uniques = uniques[live]

        dl = np.bincount(row_index, minlength=n_rows).astype(np.int64)
        return codes, uniques, row_index, dl, positions


def standard_analyzer() -> Analyzer:
    """StandardAnalyzer-equivalent: UAX#29-ish + lowercase, no stopwords."""
    return Analyzer(pattern=_STANDARD_PATTERN, lowercase=True, stopwords=frozenset(), max_token_length=255)


def english_analyzer_porter() -> Analyzer:
    """Full EnglishAnalyzer chain (``reference analysis/common/.../en/
    EnglishAnalyzer.java:103-110``): StandardTokenizer →
    EnglishPossessiveFilter → LowerCaseFilter → StopFilter(English 33) →
    PorterStemFilter."""
    return Analyzer(
        pattern=_STANDARD_PATTERN,
        lowercase=True,
        stopwords=ENGLISH_STOP_WORDS,
        max_token_length=255,
        strip_possessive=True,
        stemmer="porter",
    )


def english_analyzer() -> Analyzer:
    """EnglishAnalyzer-equivalent stopword set (no stemming)."""
    return Analyzer(pattern=_STANDARD_PATTERN, lowercase=True, stopwords=ENGLISH_STOP_WORDS, max_token_length=255)


def simple_analyzer() -> Analyzer:
    """ASCII lower-alnum analyzer, bit-identical to the ANSI-SQL expression
    ``regexp_extract_all(lower(text), '[a-z0-9]+')`` — used for the DuckDB
    oracle parity path."""
    return Analyzer(pattern=_SIMPLE_PATTERN, lowercase=True, stopwords=frozenset(), max_token_length=0)


def shingle_analyzer() -> Analyzer:
    """ShingleAnalyzerWrapper analog (``reference lucene/analysis/common/
    .../shingle/ShingleAnalyzerWrapper.java``): the oracle-parity simple
    chain plus 2-gram word shingles with unigrams."""
    return Analyzer(pattern=_SIMPLE_PATTERN, lowercase=True, stopwords=frozenset(), max_token_length=0, shingles=True)


def french_elision_articles() -> tuple:
    """FrenchAnalyzer.DEFAULT_ARTICLES (FrenchAnalyzer.java:60-63)."""
    return ("l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu", "lorsqu", "puisqu")


def common_grams_analyzer(common_words: tuple) -> Analyzer:
    """CommonGramsFilter over the simple chain (``reference lucene/analysis/
    common/.../commongrams/CommonGramsFilter.java``)."""
    return Analyzer(
        pattern=_SIMPLE_PATTERN,
        lowercase=True,
        stopwords=frozenset(),
        max_token_length=0,
        common_grams=tuple(common_words),
    )


def ngram_analyzer(min_gram: int = 2, max_gram: int = 3) -> Analyzer:
    """NGramTokenFilter(min, max) over the simple chain (``reference lucene/
    analysis/common/.../ngram/NGramTokenFilter.java``)."""
    return Analyzer(
        pattern=_SIMPLE_PATTERN,
        lowercase=True,
        stopwords=frozenset(),
        max_token_length=0,
        ngrams=(min_gram, max_gram),
    )


def edge_ngram_analyzer(min_gram: int = 2, max_gram: int = 4) -> Analyzer:
    """EdgeNGramTokenFilter(min, max) over the simple chain (``reference
    lucene/analysis/common/.../ngram/EdgeNGramTokenFilter.java``) — the
    classic search-as-you-type indexing chain."""
    return Analyzer(
        pattern=_SIMPLE_PATTERN,
        lowercase=True,
        stopwords=frozenset(),
        max_token_length=0,
        edge_ngrams=(min_gram, max_gram),
    )


def synonym_analyzer(rules: dict) -> Analyzer:
    """SynonymGraphFilter (replace mode, SolrSynonymParser `a => b` rules)
    on the oracle-parity simple chain."""
    return Analyzer(
        pattern=_SIMPLE_PATTERN,
        lowercase=True,
        stopwords=frozenset(),
        max_token_length=0,
        token_map=tuple(sorted(rules.items())),
    )


def wdgf_analyzer(
    flags: int | None = None, protected_words: tuple = (), max_token_length: int = 255
) -> Analyzer:
    """WhitespaceTokenizer → WordDelimiterGraphFilter → LowerCaseFilter —
    the reference-recommended WDGF chain (``WordDelimiterGraphFilter.java``
    class javadoc: StandardTokenizer strips intra-word delimiters, so WDGF
    wants a whitespace tokenizer; case splitting needs the filter to run
    before lowercasing).  ``flags`` defaults to the split-everything set
    (GENERATE_WORD/NUMBER_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
    STEM_ENGLISH_POSSESSIVE)."""
    from .worddelimiter import WDGF_DEFAULT_FLAGS

    return Analyzer(
        pattern=r"\S+",
        lowercase=True,
        stopwords=frozenset(),
        max_token_length=max_token_length,
        word_delimiter=WDGF_DEFAULT_FLAGS if flags is None else int(flags),
        protected_words=tuple(protected_words),
    )


def cjk_analyzer() -> Analyzer:
    """CJKAnalyzer analog (``reference lucene/analysis/common/src/java/org/
    apache/lucene/analysis/cjk/CJKAnalyzer.java``): standard tokenize with
    script splitting, lowercase, CJK character bigrams, and the reference's
    (English-word) default stop set applied to the latin tokens."""
    return Analyzer(pattern=_CJK_PATTERN, stopwords=ENGLISH_STOP_WORDS, cjk_bigrams=True)
