"""Surround query language parser — ``lucene/queryparser/src/java/org/apache/
lucene/queryparser/surround/parser/QueryParser.jj``.

Grammar (operators case-insensitive; precedence low -> high: OR, AND, NOT,
N, W, primary — ``QueryParser.jj:240-375``):

- infix ``a OR b``, ``a AND b``, ``a NOT b`` and prefix ``AND(a, b, ...)``
  forms (NOT is infix-only, :316-333);
- distance operators ``W`` (ordered) / ``N`` (unordered) with an optional
  2..99 distance prefix (``3W(a, b)`` = within 3 in order; default distance
  1, :125-129 ``getOpDistance``); left-associative infix chains build nested
  two-operand distance queries (:336-371), prefix forms are n-ary;
- terms: bare (everything but whitespace and ``, ? * ( ) : ^ "``), quoted
  ``"..."`` (escape ``\\"`` and ``\\\\``), suffix-truncated ``abc*``
  (>= 3-char prefix, :157-165), embedded-wildcard ``a?c*`` (>= 3 normal
  chars, :167-180), truncated-quoted ``"abc"*``;
- optional field prefixes ``f1:f2:q`` (:251-270) and weights ``q^1.5``
  (multiplicative, 0 < w);
- distance operands must be distance-compatible: terms, truncations, OR over
  them, or nested distance queries — AND/NOT inside W/N is an error
  (``DistanceQuery.distanceSubQueryNotAllowed``; checked at :131-137).

The parse result is the engine's Query tree: BooleanQuery (AND/OR/NOT),
SpanNearQuery (W/N; ``slop = distance - 1``, ``DistanceQuery.java:97``),
TermQuery / PrefixQuery / WildcardQuery, SpanMultiTermWrapper for
truncations in span position, and inline tuples for OR-of-terms span slots.
Deviation (documented): like the reference, terms are NOT analyzed; we
lowercase them by default (``normalize=str.lower``) so they meet our
lowercased dictionary — pass ``normalize=None`` for the reference's raw
behavior.
"""

from __future__ import annotations

import re
from dataclasses import replace as _dc_replace
from typing import Callable, List, Optional

from .query import (
    BooleanQuery,
    PrefixQuery,
    Query,
    SpanMultiTermWrapper,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
)

__all__ = ["SurroundParseError", "parse_surround"]

MINIMUM_PREFIX_LENGTH = 3  # QueryParser.jj:76
MINIMUM_CHARS_IN_TRUNC = 3  # QueryParser.jj:77

_TERM_CHAR = r'[^\s,?*():^"]'
_TOKEN_RE = re.compile(
    r"""
      (?P<quoted>"(?:[^"\\]|\\["\\])+"(?P<qtrunc>\*)?)
    | (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<comma>,)
    | (?P<colon>:)
    | (?P<carat>\^)
    | (?P<word>(?:%TC%|[*?])+)
    | (?P<ws>\s+)
    """.replace("%TC%", _TERM_CHAR),
    re.VERBOSE,
)
_DIST_RE = re.compile(r"^(?:([2-9][0-9]?|1[0-9]))?([WwNn])$")
_NUMBER_RE = re.compile(r"^[0-9]+(\.[0-9]+)?$")


class SurroundParseError(ValueError):
    """ParseException analog."""


class _Tok:
    __slots__ = ("kind", "text", "dist", "ordered")

    def __init__(self, kind, text, dist=None, ordered=None):
        self.kind = kind
        self.text = text
        self.dist = dist
        self.ordered = ordered

    def __repr__(self):  # pragma: no cover — debug aid
        return f"_Tok({self.kind}, {self.text!r})"


def _lex(s: str) -> List[_Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if m is None:
            raise SurroundParseError(f"lexical error at {i}: {s[i:]!r}")
        i = m.end()
        if m.lastgroup in (None, "ws") or m.group("ws"):
            continue
        if m.group("quoted"):
            body = m.group("quoted")
            if m.group("qtrunc"):
                inner = body[1:-2]
                out.append(_Tok("truncquoted", inner.replace('\\"', '"').replace("\\\\", "\\")))
            else:
                inner = body[1:-1]
                out.append(_Tok("quoted", inner.replace('\\"', '"').replace("\\\\", "\\")))
        elif m.group("lparen"):
            out.append(_Tok("lparen", "("))
        elif m.group("rparen"):
            out.append(_Tok("rparen", ")"))
        elif m.group("comma"):
            out.append(_Tok("comma", ","))
        elif m.group("colon"):
            out.append(_Tok("colon", ":"))
        elif m.group("carat"):
            out.append(_Tok("carat", "^"))
        else:
            w = m.group("word")
            u = w.upper()
            if u in ("OR", "AND", "NOT"):
                out.append(_Tok(u.lower(), w))
                continue
            dm = _DIST_RE.match(w)
            if dm:
                out.append(_Tok("dist", w, dist=int(dm.group(1) or 1), ordered=dm.group(2) in "Ww"))
                continue
            out.append(_Tok("word", w))
    out.append(_Tok("eof", ""))
    return out


def _is_distance_operand(q) -> bool:
    """DistanceQuery.distanceSubQueryNotAllowed: terms, truncations, OR over
    distance operands, nested distance queries."""
    if isinstance(q, (str, SpanMultiTermWrapper, SpanNearQuery)):
        return True
    if isinstance(q, tuple):
        return all(isinstance(t, str) for t in q)
    return False


class _Parser:
    def __init__(self, toks: List[_Tok], normalize: Optional[Callable[[str], str]]):
        self.toks = toks
        self.i = 0
        self.normalize = normalize

    # ------------------------------------------------------------- plumbing
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def take(self, kind=None) -> _Tok:
        t = self.toks[self.i]
        if kind is not None and t.kind != kind:
            raise SurroundParseError(f"expected {kind}, found {t.kind} {t.text!r}")
        self.i += 1
        return t

    # -------------------------------------------------------------- helpers
    def _norm(self, text: str) -> str:
        return self.normalize(text) if self.normalize else text

    def _as_query(self, node) -> Query:
        """Convert an internal node (str | tuple | wrapper | Query) to a
        standalone engine Query."""
        if isinstance(node, str):
            return TermQuery(node)
        if isinstance(node, tuple):
            return BooleanQuery.build(should=[self._as_query(c) for c in node])
        if isinstance(node, SpanMultiTermWrapper):
            return node.query
        return node

    def _as_span_clause(self, node):
        """Convert a node to a SpanNearQuery clause slot."""
        if isinstance(node, (str, tuple, SpanMultiTermWrapper, SpanNearQuery)):
            return node
        raise SurroundParseError(f"operator W/N does not allow subquery {type(node).__name__}")

    def _boost(self, node, w: float):
        if isinstance(node, (str, tuple)):
            node = self._as_query(node)
        if isinstance(node, SpanMultiTermWrapper):
            node = _dc_replace(node, query=_dc_replace(node.query, boost=node.query.boost * w))
            return node
        if hasattr(node, "boost"):
            return _dc_replace(node, boost=node.boost * w)
        from .query import BoostQuery

        return BoostQuery(node, w)

    # ----------------------------------------------------------- productions
    def top(self):
        q = self.fields_query()
        if self.peek().kind != "eof":
            raise SurroundParseError(f"unexpected trailing input at token {self.peek().text!r}")
        return q

    def fields_query(self):
        # OptionalFields: TERM COLON pairs; our index is single-field — the
        # names are parsed (grammar parity) and must be the default field
        fields = []
        while (
            self.peek().kind == "word"
            and self.toks[self.i + 1].kind == "colon"
        ):
            fields.append(self.take().text)
            self.take("colon")
        q = self.or_query()
        for f in fields:
            if f.lower() not in ("text", "contents", "body"):
                raise SurroundParseError(f"unknown field {f!r} (single-field index)")
        return q

    def _infix_list(self, sub, kinds):
        q = sub()
        items = None
        while self.peek().kind in kinds:
            self.take()
            if items is None:
                items = [q]
            items.append(sub())
        return q if items is None else items

    def or_query(self):
        r = self._infix_list(self.and_query, ("or",))
        if isinstance(r, list):
            return BooleanQuery.build(should=[self._as_query(x) for x in r])
        return r

    def and_query(self):
        r = self._infix_list(self.not_query, ("and",))
        if isinstance(r, list):
            return BooleanQuery.build(must=[self._as_query(x) for x in r])
        return r

    def not_query(self):
        r = self._infix_list(self.n_query, ("not",))
        if isinstance(r, list):
            return BooleanQuery.build(
                must=[self._as_query(r[0])], must_not=[self._as_query(x) for x in r[1:]]
            )
        return r

    def _distance_chain(self, sub, ordered_kind):
        q = sub()
        while self.peek().kind == "dist" and self.peek().ordered == ordered_kind:
            t = self.take()
            rhs = sub()
            for part, side in ((q, "left"), (rhs, "right")):
                if not _is_distance_operand(part):
                    raise SurroundParseError(
                        f"operator {t.text}: does not allow subquery {type(part).__name__}"
                    )
            q = SpanNearQuery(
                (self._as_span_clause(q), self._as_span_clause(rhs)),
                slop=t.dist - 1,
                in_order=t.ordered,
            )
        return q

    def n_query(self):
        return self._distance_chain(self.w_query, False)

    def w_query(self):
        return self._distance_chain(self.primary, True)

    def primary(self):
        t = self.peek()
        if t.kind == "lparen":
            self.take()
            q = self.fields_query()
            self.take("rparen")
            return self._weights(q)
        if t.kind in ("or", "and") or t.kind == "dist":
            return self._weights(self.prefix_operator())
        return self._weights(self.simple_term())

    def prefix_operator(self):
        op = self.take()
        items = self.fields_query_list()
        if op.kind == "or":
            # OR over all-plain-term operands stays a span-compatible tuple
            if all(isinstance(x, str) for x in items):
                return tuple(items)
            return BooleanQuery.build(should=[self._as_query(x) for x in items])
        if op.kind == "and":
            return BooleanQuery.build(must=[self._as_query(x) for x in items])
        # distance prefix form: n-ary
        for part in items:
            if not _is_distance_operand(part):
                raise SurroundParseError(
                    f"operator {op.text}: does not allow subquery {type(part).__name__}"
                )
        return SpanNearQuery(
            tuple(self._as_span_clause(x) for x in items),
            slop=op.dist - 1,
            in_order=op.ordered,
        )

    def fields_query_list(self):
        self.take("lparen")
        items = [self.fields_query()]
        while self.peek().kind == "comma":
            self.take()
            items.append(self.fields_query())
        self.take("rparen")
        if len(items) < 2:
            raise SurroundParseError("prefix operator needs at least 2 operands")
        return items

    def simple_term(self):
        t = self.peek()
        if t.kind == "quoted":
            self.take()
            return self._norm(t.text)
        if t.kind == "truncquoted":
            self.take()
            return self._make_prefix(self._norm(t.text), quoted=True)
        if t.kind in ("word", "dist"):
            # a distance token in term position never reaches here (grammar
            # routes it to prefix_operator); plain words may contain * / ?
            self.take()
            w = self._norm(t.text)
            if w.endswith("*") and "?" not in w and "*" not in w[:-1]:
                return self._make_prefix(w[:-1], quoted=False)
            if "*" in w or "?" in w:
                n_normal = sum(1 for c in w if c not in "*?")
                if n_normal < MINIMUM_CHARS_IN_TRUNC:
                    raise SurroundParseError(f"Too unrestrictive truncation: {t.text}")
                return SpanMultiTermWrapper(WildcardQuery(w))
            return w
        raise SurroundParseError(f"unexpected token {t.text!r}")

    def _make_prefix(self, prefix: str, quoted: bool):
        if len(prefix) < MINIMUM_PREFIX_LENGTH:
            raise SurroundParseError(f"Too unrestrictive truncation: {prefix}*")
        return SpanMultiTermWrapper(PrefixQuery(prefix))

    def _weights(self, q):
        while self.peek().kind == "carat":
            self.take()
            num = self.take("word").text
            if not _NUMBER_RE.match(num):
                raise SurroundParseError(f"Cannot handle boost value: {num}")
            w = float(num)
            if w <= 0:
                raise SurroundParseError(f"Cannot handle boost value: {num}")
            q = self._boost(q, w)
        return q


def parse_surround(s: str, normalize: Optional[Callable[[str], str]] = str.lower) -> Query:
    """Parse a surround expression into an engine Query tree."""
    p = _Parser(_lex(s), normalize)
    q = p.top()
    return p._as_query(q)
