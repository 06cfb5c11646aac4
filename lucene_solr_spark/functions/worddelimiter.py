"""WordDelimiterGraphFilter — the intra-word split/catenate token filter.

Reference: ``lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterGraphFilter.java`` (flags :99-164, buffering
:258-335, emission :337-424, concatenations :568-645) and
``WordDelimiterIterator.java`` (char classes :25-33, ``next()`` :120-156,
``isBreak`` :197-218, bounds/possessive :230-268).

The filter runs BEFORE lowercasing (case transitions are its whole point) on
whitespace tokens (the reference recommends WhitespaceTokenizer because
StandardTokenizer already strips intra-word delimiters).  Each input token
expands to a list of parts on a local position axis:

- subwords split on delimiter chars, case transitions (``SPLIT_ON_CASE_
  CHANGE``) and letter/number transitions (``SPLIT_ON_NUMERICS``), with
  leading/trailing delimiters trimmed and trailing ``'s`` stemmed
  (``STEM_ENGLISH_POSSESSIVE``);
- generated parts occupy consecutive local positions (``GENERATE_WORD_PARTS``
  / ``GENERATE_NUMBER_PARTS``);
- catenations of maximal same-type runs (``CATENATE_WORDS`` /
  ``CATENATE_NUMBERS``) and of the whole token (``CATENATE_ALL``), plus the
  optional ``PRESERVE_ORIGINAL``, sit at the start position of their span —
  posIncrement-0 overlap tokens in Lucene terms, so they do NOT count toward
  the BM25 field length (discountOverlaps), exactly like shingles;
- emission order sorts by (start position asc, span length desc), the
  reference's PositionSorter (:439-470).

This kernel is pure Python over the (small) per-batch token dictionary; the
Arrow batch path expands occurrences through the dictionary with numpy
gathers (see ``Analyzer._analyze_batch_wdgf``).
"""

from __future__ import annotations

__all__ = [
    "GENERATE_WORD_PARTS",
    "GENERATE_NUMBER_PARTS",
    "CATENATE_WORDS",
    "CATENATE_NUMBERS",
    "CATENATE_ALL",
    "PRESERVE_ORIGINAL",
    "SPLIT_ON_CASE_CHANGE",
    "SPLIT_ON_NUMERICS",
    "STEM_ENGLISH_POSSESSIVE",
    "WDGF_DEFAULT_FLAGS",
    "word_delimiter_parts",
]

# WordDelimiterGraphFilter.java:99-164
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

WDGF_DEFAULT_FLAGS = (
    GENERATE_WORD_PARTS
    | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE
    | SPLIT_ON_NUMERICS
    | STEM_ENGLISH_POSSESSIVE
)

_VALID_FLAGS = (
    GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
    | CATENATE_NUMBERS | CATENATE_ALL | PRESERVE_ORIGINAL
    | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE
)

# WordDelimiterIterator.java:25-33
_LOWER, _UPPER, _DIGIT, _DELIM = 0x01, 0x02, 0x04, 0x08
_ALPHA = _LOWER | _UPPER


def _char_type(ch: str) -> int:
    """DEFAULT_WORD_DELIM_TABLE / getType (WordDelimiterIterator.java:82-100,
    286-330): lower, upper, digit; titlecase/modifier/other letters and
    combining marks are ALPHA (never a case break); letter/other numbers are
    DIGIT; everything else is a subword delimiter."""
    if ch.islower():
        return _LOWER
    if ch.isupper():
        return _UPPER
    if ch.isdigit():
        return _DIGIT
    import unicodedata

    cat = unicodedata.category(ch)
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return _ALPHA
    if cat in ("Nd", "Nl", "No"):
        return _DIGIT
    return _DELIM


def _is_break(last: int, cur: int, split_case: bool, split_num: bool) -> bool:
    """WordDelimiterIterator.isBreak (:197-218)."""
    if (cur & last) != 0:
        return False
    if not split_case and (last & _ALPHA) and (cur & _ALPHA):
        return False
    if (last & _UPPER) and (cur & _ALPHA):
        return False  # UPPER->letter never splits (handles "NUTCHSolr" runs)
    if not split_num and (
        ((last & _ALPHA) and (cur & _DIGIT)) or ((last & _DIGIT) and (cur & _ALPHA))
    ):
        return False
    return True


def _subwords(text: str, types: list[int], split_case: bool, split_num: bool, stem_poss: bool):
    """WordDelimiterIterator: (start, end) subword slices after bounds trim
    and possessive stemming, plus (start_bounds, end_bounds, has_possessive).
    """
    n = len(text)
    start_b, end_b = 0, n
    while start_b < n and types[start_b] == _DELIM:
        start_b += 1
    while end_b > start_b and types[end_b - 1] == _DELIM:
        end_b -= 1

    def ends_with_possessive(pos: int) -> bool:
        return (
            stem_poss
            and pos > 2
            and text[pos - 2] == "'"
            and text[pos - 1] in "sS"
            and (types[pos - 3] & _ALPHA) != 0
            and (pos == end_b or types[pos] == _DELIM)
        )

    has_poss = ends_with_possessive(end_b)
    out = []
    cur = start_b
    skip_poss = False
    while True:
        if skip_poss:
            cur += 2
            skip_poss = False
        while cur < end_b and types[cur] == _DELIM:
            cur += 1
        if cur >= end_b:
            break
        last = types[cur]
        end = cur + 1
        while end < end_b:
            t = types[end]
            if _is_break(last, t, split_case, split_num):
                break
            last = t
            end = end + 1
        if end < end_b - 1 and ends_with_possessive(end + 2):
            skip_poss = True
        out.append((cur, end))
        cur = end
    return out, start_b, end_b, has_poss


def word_delimiter_parts(
    text: str, flags: int = WDGF_DEFAULT_FLAGS, protected: frozenset = frozenset()
):
    """Expand one token: returns ``(parts, n_positions)`` where ``parts`` is
    the emission-ordered list of ``(term, local_start_pos)`` and
    ``n_positions`` is how many graph positions the token occupies (the
    amount the document position axis advances; a token swallowed entirely —
    all delimiters without PRESERVE_ORIGINAL — returns ``([], 1)``: a
    position hole, like the reference's accumulated position increment)."""
    has = lambda f: (flags & f) != 0  # noqa: E731
    n = len(text)
    types = [_char_type(c) for c in text]
    subs, start_b, end_b, has_poss = _subwords(
        text, types, has(SPLIT_ON_CASE_CHANGE), has(SPLIT_ON_NUMERICS),
        has(STEM_ENGLISH_POSSESSIVE),
    )

    # incrementToken fast paths (WordDelimiterGraphFilter.java:355-374)
    if subs and subs[0] == (0, n) or (protected and text in protected):
        return [(text, 0)], 1
    if not subs:
        if has(PRESERVE_ORIGINAL):
            return [(text, 0)], 1
        return [], 1  # swallowed: position hole

    # bufferWordParts (:258-335)
    buffered: list[tuple[str, int, int]] = []  # (term, startPos, endPos)
    word_pos = 0

    single_word = (
        subs[0][0] == start_b
        and len(subs) == 1
        and subs[0][1] == (end_b - 2 if has_poss else end_b)
    )
    if single_word:
        s, e = subs[0]
        buffered.append((text[s:e], word_pos, word_pos + 1))
        word_pos += 1
    else:
        concat = {"text": "", "start_pos": 0, "type": 0, "count": 0}
        concat_all = {"text": "", "start_pos": 0, "type": 0, "count": 0}
        last_concat_count = 0

        def word_type(s: int) -> int:
            t = types[s]
            return _ALPHA if (t & _ALPHA) else t

        def should_generate(wt: int) -> bool:
            return (has(GENERATE_WORD_PARTS) and (wt & _ALPHA) != 0) or (
                has(GENERATE_NUMBER_PARTS) and (wt & _DIGIT) != 0
            )

        def flush(c):
            nonlocal word_pos, last_concat_count
            if word_pos == c["start_pos"]:
                word_pos += 1  # not generating parts: advance now
            last_concat_count = c["count"]
            if c["count"] != 1 or not should_generate(c["type"]):
                buffered.append((c["text"], c["start_pos"], word_pos))
            c.update(text="", start_pos=0, type=0, count=0)

        for s, e in subs:
            wt = word_type(s)
            if concat["count"] and (concat["type"] & wt) == 0:
                flush(concat)
            if (has(CATENATE_WORDS) and (wt & _ALPHA)) or (
                has(CATENATE_NUMBERS) and (wt & _DIGIT)
            ):
                if not concat["count"]:
                    concat.update(type=wt, start_pos=word_pos)
                concat["text"] += text[s:e]
                concat["count"] += 1
            if has(CATENATE_ALL):
                if not concat_all["count"]:
                    concat_all.update(type=wt, start_pos=word_pos)
                concat_all["text"] += text[s:e]
                concat_all["count"] += 1
            if should_generate(wt):
                buffered.append((text[s:e], word_pos, word_pos + 1))
                word_pos += 1
        if concat["count"]:
            flush(concat)
        if concat_all["count"]:
            # only if we haven't output this same combo above (:315-325)
            if concat_all["count"] > last_concat_count:
                if word_pos == concat_all["start_pos"]:
                    word_pos += 1
                buffered.append((concat_all["text"], concat_all["start_pos"], word_pos))

    if has(PRESERVE_ORIGINAL):
        if word_pos == 0:
            word_pos += 1
        buffered.append((text, 0, word_pos))

    # PositionSorter (:439-470): startPos asc, span (endPos) desc; stable
    buffered.sort(key=lambda p: (p[1], -p[2]))
    return [(term, sp) for term, sp, _ in buffered], word_pos
