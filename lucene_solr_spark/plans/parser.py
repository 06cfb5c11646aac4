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
    FuzzyQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

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
    def __init__(self, tokens, analyzer):
        self.toks = tokens
        self.i = 0
        self.an = analyzer

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

    def parse_atom(self):
        kind, val = self.next()
        q = None
        if kind == "lparen":
            q = self.parse_query()
            k2, _ = self.peek()
            if k2 == "rparen":
                self.next()
        elif kind == "phrase":
            toks = self.an.tokens(val.strip('"'))
            if not toks:
                q = None
            elif len(toks) == 1:
                q = TermQuery(toks[0])
            else:
                q = PhraseQuery(tuple(toks))
        elif kind == "range":
            # [a TO b] inclusive / {a TO b} exclusive (QueryParser.jj ranges)
            inner = val[1:-1]
            m = re.match(r"\s*(\S+)\s+TO\s+(\S+)\s*", inner)
            if m:
                lo = None if m.group(1) == "*" else m.group(1).lower()
                hi = None if m.group(2) == "*" else m.group(2).lower()
                q = TermRangeQuery(lo, hi, val[0] == "[", val[-1] == "]")
        elif kind == "term":
            if val.endswith("*") and len(val) > 1 and "*" not in val[:-1] and "?" not in val:
                norm = self.an.tokens(val[:-1])
                q = PrefixQuery(norm[0]) if norm else None
            elif "*" in val or "?" in val:
                q = WildcardQuery(val.lower())  # Analyzer.normalize = lowercase
            else:
                toks = self.an.tokens(val)
                if not toks:
                    q = None
                elif len(toks) == 1:
                    q = TermQuery(toks[0])
                else:
                    q = BooleanQuery(clauses=tuple(BooleanClause(TermQuery(t), "SHOULD") for t in toks))
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


def parse_query(s: str, analyzer):
    """Parse a classic-syntax query string into a Query AST."""
    return _Parser(_tokenize(s), analyzer).parse_query()
