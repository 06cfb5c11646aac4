"""Flexible (StandardQueryParser) grammar — parse to the existing Query AST.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
flexible/standard/StandardQueryParser.java:103`` with the
``StandardSyntaxParser.jj`` grammar and the ``BooleanQuery2ModifierNode-
Processor`` / ``GroupQueryNodeProcessor`` pipeline.  Evaluation reuses the
classic parser's Query classes unchanged — only the surface differs:

- **operator-vs-whitespace** (``TestStandardQP.testOperatorVsWhitespace``):
  a standalone ``+`` / ``-`` / ``!`` binds to the NEXT clause, so
  ``a - b`` ≡ ``a -b`` and ``a ! b`` ≡ ``a -b``;
- **NOT / !** modifier (StandardSyntaxParser.jj ModClause): both negate the
  following clause;
- **configurable default operator** (``StandardQueryConfigHandler.Operator``,
  default OR — ``TestStandardQP.testDefaultOperator``): under AND, every
  clause without an explicit modifier that is not OR-joined becomes MUST,
  INCLUDING the clauses inside an analyzed multi-token expansion
  (``TestStandardQP.testQPA``: AND-default ``term phrase term`` parses to
  ``+term +(+phrase1 +phrase2) +term`` where the classic parser leaves the
  inner group SHOULD);
- **regexp clauses** ``/pattern/`` (StandardSyntaxParser REGEXPTERM).

Everything else (phrases, ranges, field clauses, ``^boost``, ``~fuzzy``,
prefix/wildcard, parentheses) is shared with the classic subset via
inheritance from :class:`..parser._Parser`.
"""

from __future__ import annotations

import re

from .parser import _FIELD_RE, _Parser  # noqa: F401 (shared grammar pieces)
from .query import (
    BooleanClause,
    BooleanQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    RegexpQuery,
    TermQuery,
)

# the classic token set plus ! (NOT modifier) and /regex/ clauses
_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<plus>\+)
      | (?P<minus>-|!)
      | (?P<not>NOT\b)
      | (?P<phrase>"[^"]*")
      | (?P<regex>/[^/]*/)
      | (?P<range>[\[{][^\]}]*[\]}])
      | (?P<and>AND\b|&&)
      | (?P<or>OR\b|\|\|)
      | (?P<boost>\^[0-9.]+)
      | (?P<fuzzy>~[0-9]*)
      | (?P<term>[^\s()+\-^"~!/][^\s()^"~]*)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str):
    pos = 0
    out = []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":  # trailing whitespace only
                break
            # StandardQueryParser throws QueryNodeParseException on syntax it
            # cannot consume (e.g. an unterminated /regex/ or a stray '/');
            # silently dropping the tail would evaluate a DIFFERENT query
            raise ValueError(
                f"flexible parser: cannot tokenize {s[pos:pos + 20]!r} at offset {pos}"
            )
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append(("minus" if kind == "not" else kind, val))
                break
    return out


class _FlexibleParser(_Parser):
    def __init__(self, tokens, analyzer, default_field="text", default_operator="OR"):
        super().__init__(tokens, analyzer, default_field)
        if default_operator not in ("OR", "AND"):
            raise ValueError("default_operator must be 'OR' or 'AND'")
        self.default_operator = default_operator

    def parse_query(self):
        # collect (explicit_occur, query, connective-to-the-LEFT) first, then
        # resolve unmodified clauses against the default operator — the
        # GroupQueryNodeProcessor shape: an explicit AND promotes both
        # neighbors to MUST under OR-default; an explicit OR demotes both
        # neighbors to SHOULD under AND-default
        entries: list[list] = []  # [explicit_occur|None, query, left_conn]
        pending = None
        while True:
            kind, _ = self.peek()
            if kind is None or kind == "rparen":
                break
            if kind == "and":
                self.next()
                pending = "AND"
                continue
            if kind == "or":
                self.next()
                pending = "OR"
                continue
            explicit = None
            if kind == "plus":
                self.next()
                explicit = "MUST"
            elif kind == "minus":
                self.next()
                explicit = "MUST_NOT"
            q = self.parse_atom()
            if q is None:
                pending = None
                continue
            entries.append([explicit, q, pending])
            pending = None
        if not entries:
            return MatchNoDocsQuery()

        clauses = []
        for i, (explicit, q, left) in enumerate(entries):
            right = entries[i + 1][2] if i + 1 < len(entries) else None
            if explicit is not None:
                occur = explicit
            elif self.default_operator == "AND":
                occur = "SHOULD" if left == "OR" or right == "OR" else "MUST"
            else:
                occur = "MUST" if left == "AND" or right == "AND" else "SHOULD"
            clauses.append(BooleanClause(q, occur))
        if len(clauses) == 1 and clauses[0].occur in ("SHOULD", "MUST"):
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
        # multi-token expansion: the default operator applies INSIDE the
        # group (TestStandardQP.testQPA — the flexible/classic divergence)
        inner = "MUST" if self.default_operator == "AND" else "SHOULD"
        return BooleanQuery(
            clauses=tuple(BooleanClause(TermQuery(t), inner) for t in toks)
        )

    def parse_atom(self):
        kind, val = self.peek()
        if kind == "regex":
            self.next()
            q = RegexpQuery(val[1:-1])
            k2, v2 = self.peek()
            if k2 == "boost":
                from .query import BoostQuery

                self.next()
                q = BoostQuery(q, float(v2[1:]))
            return q
        return super().parse_atom()


def parse_flexible_query(
    s: str, analyzer, default_field: str = "text", default_operator: str = "OR"
):
    """Parse a StandardQueryParser-syntax query string into a Query AST."""
    return _FlexibleParser(_tokenize(s), analyzer, default_field, default_operator).parse_query()
