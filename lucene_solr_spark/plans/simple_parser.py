"""SimpleQueryParser — faithful port of the reference state machine.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java`` (661 LoC).  Grammar: ``+`` AND, ``|`` OR,
``-`` NOT (two negate), ``"..."`` phrase (``~N`` slop), ``(...)`` precedence,
``\\`` escape, trailing ``*`` prefix, ``term~N`` fuzzy (bare ``~`` = 2,
capped at 2 = LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE), whitespace
separators.  The parser NEVER raises — unmatched ``)``/``"`` and malformed
input degrade exactly as the reference degrades (extraneous characters
ignored, unclosed constructs re-read as terms, :262-268,327-332).

Tree building mirrors ``buildQueryTree``/``addClause`` (:425-478): same-
operation runs flatten into one BooleanQuery; an operation CHANGE wraps the
current tree as the first clause of a new parent under the new operation.
Negation wraps the branch as ``(+MatchAll −branch)`` (:432-439).  Single-
field form of the factories (:540-620): terms/phrases run through the
analyzer, prefix/fuzzy only through ``Analyzer.normalize`` (lowercase,
``StandardAnalyzer.java:92-95``).
"""

from __future__ import annotations

from typing import Optional

from .query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = {" ", "\t", "\n", "\r"}


class _State:
    __slots__ = ("data", "index", "length", "top", "current_op", "previous_op", "not_count")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top: Optional[Query] = None
        self.current_op: Optional[str] = None
        self.previous_op: Optional[str] = None
        self.not_count = 0


class SimpleQueryParser:
    def __init__(self, analyzer, default_operator: str = "SHOULD", flags: int = ALL_OPERATORS):
        if default_operator not in ("SHOULD", "MUST"):
            raise ValueError("invalid operator: only SHOULD or MUST are allowed")
        self.analyzer = analyzer
        self.default_operator = default_operator
        self.flags = flags

    # ------------------------------------------------------------ entry
    def parse(self, query_text: str) -> Query:
        if query_text.strip() == "*":
            return MatchAllQuery()
        state = _State(query_text, 0, len(query_text))
        self._parse_sub_query(state)
        return state.top if state.top is not None else MatchNoDocsQuery()

    # ------------------------------------------------------ state machine
    def _has(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _parse_sub_query(self, state: _State) -> None:
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and self._has(PRECEDENCE_OPERATORS):
                self._consume_sub_query(state)
            elif c == ")" and self._has(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous, ignored
            elif c == '"' and self._has(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif c == "+" and self._has(AND_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = "MUST"
                state.index += 1
            elif c == "|" and self._has(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = "SHOULD"
                state.index += 1
            elif c == "-" and self._has(NOT_OPERATOR):
                state.not_count += 1
                state.index += 1
                continue  # keep the pending not across this char only
            elif c in _WS and self._has(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            state.not_count = 0

    def _consume_sub_query(self, state: _State) -> None:
        state.index += 1
        start = state.index
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing ')': '(' is extraneous
        elif state.index == start:
            state.current_op = None  # '()': empty, op resets
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        state.index += 1
        start = state.index
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (
                        state.length > state.index + 1
                        and state.data[state.index + 1] == "~"
                        and self._has(NEAR_OPERATOR)
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing '"'
        elif state.index == start:
            state.current_op = None
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = state.data[state.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and self._has(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and self._has(PREFIX_OPERATOR)
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if buf:
            if fuzzy and self._has(FUZZY_OPERATOR):
                token = "".join(buf)
                fuzziness = min(self._parse_fuzziness(state), 2)
                if fuzziness == 0:
                    branch = self._new_default_query(token)
                else:
                    branch = FuzzyQuery(self.analyzer.normalize(token), max_edits=fuzziness)
            elif prefix:
                branch = PrefixQuery(self.analyzer.normalize("".join(buf[:-1])))
            else:
                branch = self._new_default_query("".join(buf))
            self._build_query_tree(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        digits: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                digits.append(state.data[state.index])
        text = "".join(digits)
        if text == "":
            return 2  # automatic fuzziness
        try:
            fuzziness = int(text)
        except ValueError:
            return 0
        return max(fuzziness, 0)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        return (
            (c == '"' and self._has(PHRASE_OPERATOR))
            or (c == "|" and self._has(OR_OPERATOR))
            or (c == "+" and self._has(AND_OPERATOR))
            or (c == "(" and self._has(PRECEDENCE_OPERATORS))
            or (c == ")" and self._has(PRECEDENCE_OPERATORS))
            or (c in _WS and self._has(WHITESPACE_OPERATOR))
        )

    # ----------------------------------------------------------- factories
    def _new_default_query(self, text: str) -> Optional[Query]:
        toks = self.analyzer.tokens(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        kw = "must" if self.default_operator == "MUST" else "should"
        return BooleanQuery.build(**{kw: [TermQuery(t) for t in toks]})

    def _new_phrase_query(self, text: str, slop: int) -> Optional[Query]:
        toks = self.analyzer.tokens(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        return PhraseQuery(tuple(toks), slop=slop)

    # ---------------------------------------------------------- tree build
    def _build_query_tree(self, state: _State, branch: Optional[Query]) -> None:
        if branch is None:
            return
        if state.not_count % 2 == 1:
            branch = BooleanQuery(
                clauses=(
                    BooleanClause(branch, "MUST_NOT"),
                    BooleanClause(MatchAllQuery(), "SHOULD"),
                )
            )
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                state.top = BooleanQuery(clauses=(BooleanClause(state.top, state.current_op),))
            state.top = BooleanQuery(
                clauses=state.top.clauses + (BooleanClause(branch, state.current_op),),
                minimum_should_match=state.top.minimum_should_match,
            )
            state.previous_op = state.current_op
        state.current_op = None
