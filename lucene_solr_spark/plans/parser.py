"""Classic query-parser subset.

Grammar per the reference classic parser (``reference lucene/queryparser/src/
java/org/apache/lucene/queryparser/classic/QueryParser.jj:66-67,196-197``)::

    Query  ::= ( Clause )*
    Clause ::= ["+", "-"] [<TERM> ":"] ( <TERM> | <PHRASE> | "(" Query ")" ) ["^" boost]

Supported here: +/- prefixes, quoted phrases, parenthesized sub-queries,
``^boost``, ``AND``/``OR``/``&&``/``||`` connectives, trailing ``*`` prefix
queries.  Like ``QueryParserBase.parse`` (``QueryParserBase.java:105-109``)
the produced terms are normalized with the supplied analyzer
(``Analyzer.normalize`` ≡ lowercase for StandardAnalyzer,
``StandardAnalyzer.java:92-95``); a term that analyzes to nothing (stopword)
drops its clause; a multi-token term becomes a phrase-free OR per classic
behavior simplification.

Default boolean operator is OR (SHOULD), as in the reference.
"""

from __future__ import annotations

import re

from .query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FieldRangeQuery,
    FieldTermQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_FIELD_RE = re.compile(r"[A-Za-z_][\w.]*")


def _coerce(v: str):
    """Numeric range bounds become ints/floats so the Catalyst predicate
    compares natively (PointRangeQuery vs TermRangeQuery distinction)."""
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<phrase>"[^"]*")
      | (?P<range>[\[{][^\]}]*[\]}])
      | (?P<and>AND\b|&&)
      | (?P<or>OR\b|\|\|)
      | (?P<boost>\^[0-9.]+)
      | (?P<fuzzy>~[0-9]*)
      | (?P<term>[^\s()+\-^"~][^\s()^"~]*)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str):
    pos = 0
    out = []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


class _Parser:
    def __init__(self, tokens, analyzer, default_field="text"):
        self.toks = tokens
        self.i = 0
        self.an = analyzer
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_query(self):
        clauses = []
        pending_op = None
        while True:
            kind, _ = self.peek()
            if kind is None or kind == "rparen":
                break
            if kind == "and":
                self.next()
                pending_op = "AND"
                continue
            if kind == "or":
                self.next()
                pending_op = "OR"
                continue
            occur = "SHOULD"
            if kind == "plus":
                self.next()
                occur = "MUST"
            elif kind == "minus":
                self.next()
                occur = "MUST_NOT"
            q = self.parse_atom()
            if q is None:
                continue
            # classic parser: `a AND b` promotes both sides to MUST
            if pending_op == "AND" and occur == "SHOULD":
                occur = "MUST"
                if clauses and clauses[-1].occur == "SHOULD":
                    clauses[-1] = BooleanClause(clauses[-1].query, "MUST")
            pending_op = None
            clauses.append(BooleanClause(q, occur))
        if not clauses:
            return MatchNoDocsQuery()
        if len(clauses) == 1 and clauses[0].occur == "SHOULD":
            return clauses[0].query
        return BooleanQuery(clauses=tuple(clauses))

    def _text_atom(self, val, phrase=False):
        toks = self.an.tokens(val)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        if phrase:
            return PhraseQuery(tuple(toks))
        return BooleanQuery(clauses=tuple(BooleanClause(TermQuery(t), "SHOULD") for t in toks))

    def parse_atom(self):
        kind, val = self.next()
        q = None
        if kind == "lparen":
            q = self.parse_query()
            k2, _ = self.peek()
            if k2 == "rparen":
                self.next()
        elif kind == "phrase":
            q = self._text_atom(val.strip('"'), phrase=True)
        elif kind == "range":
            # [a TO b] inclusive / {a TO b} exclusive (QueryParser.jj ranges)
            inner = val[1:-1]
            m = re.match(r"\s*(\S+)\s+TO\s+(\S+)\s*", inner)
            if m:
                lo = None if m.group(1) == "*" else m.group(1).lower()
                hi = None if m.group(2) == "*" else m.group(2).lower()
                q = TermRangeQuery(lo, hi, val[0] == "[", val[-1] == "]")
        elif kind == "term" and ":" in val and not val.startswith(":"):
            # [field ":"] clause per the classic grammar (QueryParser.jj:
            # 196-197). Non-default fields are keyword/point columns
            # (StringField / PointRangeQuery -> FieldTermQuery /
            # FieldRangeQuery); the default field re-enters text analysis.
            fld, rest = val.split(":", 1)
            if not _FIELD_RE.fullmatch(fld):
                q = self._text_atom(val)
            elif rest.startswith(("[", "{")) or (
                rest == "" and self.peek()[0] == "range"
            ):
                if rest == "":
                    rest = self.next()[1]
                else:
                    # the tokenizer split "f:[a TO b]" mid-range: reassemble
                    while not rest.endswith(("]", "}")) and self.peek()[0] is not None:
                        rest += " " + self.next()[1]
                m = re.match(r"[\[{]\s*(\S+)\s+TO\s+(\S+)\s*[\]}]", rest)
                if m:
                    lo = None if m.group(1) == "*" else _coerce(m.group(1))
                    hi = None if m.group(2) == "*" else _coerce(m.group(2))
                    if fld == self.default_field:
                        q = TermRangeQuery(
                            None if lo is None else str(lo).lower(),
                            None if hi is None else str(hi).lower(),
                            rest[0] == "[",
                            rest[-1] == "]",
                        )
                    else:
                        q = FieldRangeQuery(fld, lo, hi, rest[0] == "[", rest[-1] == "]")
            elif rest == "" and self.peek()[0] == "phrase":
                v2 = self.next()[1].strip('"')
                q = self._text_atom(v2, phrase=True) if fld == self.default_field else FieldTermQuery(fld, v2)
            elif fld == self.default_field:
                q = self._text_atom(rest)
            else:
                q = FieldTermQuery(fld, rest)
        elif kind == "term":
            if val.endswith("*") and len(val) > 1 and "*" not in val[:-1] and "?" not in val:
                norm = self.an.tokens(val[:-1])
                q = PrefixQuery(norm[0]) if norm else None
            elif "*" in val or "?" in val:
                q = WildcardQuery(val.lower())  # Analyzer.normalize = lowercase
            else:
                q = self._text_atom(val)
        # optional ~fuzzy (terms only, FuzzyQuery default maxEdits=2)
        k2, v2 = self.peek()
        if isinstance(q, TermQuery) and k2 == "fuzzy":
            self.next()
            edits = int(v2[1:]) if len(v2) > 1 else 2
            q = FuzzyQuery(q.term, max_edits=edits)
            k2, v2 = self.peek()
        # optional ^boost
        if q is not None and k2 == "boost":
            self.next()
            q = BoostQuery(q, float(v2[1:]))
        return q


def parse_query(s: str, analyzer, default_field: str = "text"):
    """Parse a classic-syntax query string into a Query AST."""
    return _Parser(_tokenize(s), analyzer, default_field).parse_query()
