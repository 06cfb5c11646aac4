"""JS-like ranking expressions compiled to Catalyst columns.

Re-expression of the reference expressions module (``reference lucene/
expressions/src/java/org/apache/lucene/expressions/js/JavascriptCompiler.
java`` + ``Javascript.g4``): a double-typed expression language over bound
variables (``_score``, doc-value fields) used as a ranking
``DoubleValuesSource``.

Grammar (Javascript.g4, precedence high→low): primary/call → unary
``! ~ + -`` → ``* / %`` → ``+ -`` → ``<< >> >>>`` → ``< <= > >=`` →
``== !=`` → ``&`` → ``^`` → ``|`` → ``&&`` → ``||`` → right-assoc ``?:``.
Semantics: everything is a double; comparisons and boolean ops yield
1.0/0.0; bitwise/shift ops run on the long conversion and widen back
(JavascriptCompiler pushes ``(long)`` casts around bitwise bytecode); octal
and hex literals are supported.

The default function registry mirrors ``JavascriptCompiler.properties``
verbatim, including ``logn(base, x)`` (``MathUtil.log(base, x)``) and
``haversin(lat1, lon1, lat2, lon2)`` in kilometers
(``SloppyMath.haversinKilometers``).

Spark-first: the compiled expression is a pure Column tree — whole-stage
codegen, no UDF; variables resolve through a caller-supplied binding
(DoubleValuesSource.fromExpression ↔ a column lookup).
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from pyspark.sql import Column, functions as F

__all__ = ["compile_expression", "DEFAULT_FUNCTIONS"]

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<hex>0[xX][0-9a-fA-F]+)
      | (?P<octal>0[0-7]+)
      | (?P<num>(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)
      | (?P<var>[_$A-Za-z][\w$]*(?:\.[_$A-Za-z][\w$]*)*)
      | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!,~<>&^|?:])
    )""",
    re.VERBOSE,
)


def _tokenize(src: str):
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"unexpected character at {pos}: {src[pos:pos+10]!r}")
        pos = m.end()
        if m.lastgroup == "hex":
            toks.append(("num", float(int(m.group("hex"), 16))))
        elif m.lastgroup == "octal":
            toks.append(("num", float(int(m.group("octal"), 8))))
        elif m.lastgroup == "num":
            toks.append(("num", float(m.group("num"))))
        elif m.lastgroup == "var":
            toks.append(("var", m.group("var")))
        else:
            toks.append(("op", m.group("op")))
    toks.append(("end", None))
    return toks


def _d(x) -> Column:
    return x.cast("double") if isinstance(x, Column) else F.lit(float(x)).cast("double")


def _bool(c: Column) -> Column:
    """Truthiness of a double (JavascriptCompiler: != 0)."""
    return c != F.lit(0.0)


def _as01(cond: Column) -> Column:
    return F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))


def _long_op(a: Column, b, fn) -> Column:
    return _d(fn(a.cast("long"), b))


DEFAULT_FUNCTIONS: dict = {
    "abs": (1, lambda a: F.abs(a)),
    "acos": (1, lambda a: F.acos(a)),
    "acosh": (1, lambda a: F.log(F.sqrt(a * a - F.lit(1.0)) + a)),  # MathUtil.acosh:124-126
    "asin": (1, lambda a: F.asin(a)),
    "asinh": (1, lambda a: F.log(F.sqrt(a * a + F.lit(1.0)) + a)),
    "atan": (1, lambda a: F.atan(a)),
    "atan2": (2, lambda a, b: F.atan2(a, b)),
    "atanh": (1, lambda a: F.lit(0.5) * F.log((F.lit(1.0) + a) / (F.lit(1.0) - a))),
    "ceil": (1, lambda a: F.ceil(a).cast("double")),
    "cos": (1, lambda a: F.cos(a)),
    "cosh": (1, lambda a: F.cosh(a)),
    "exp": (1, lambda a: F.exp(a)),
    "floor": (1, lambda a: F.floor(a).cast("double")),
    # SloppyMath.haversinKilometers:76-79 (exact-asin variant)
    "haversin": (
        4,
        lambda la1, lo1, la2, lo2: F.lit(2.0 * 6371.0087714)
        * F.asin(
            F.least(
                F.lit(1.0),
                F.sqrt(
                    (
                        F.pow(F.sin(F.radians(la2 - la1) / 2), 2)
                        + F.cos(F.radians(la1)) * F.cos(F.radians(la2)) * F.pow(F.sin(F.radians(lo2 - lo1) / 2), 2)
                    )
                ),
            )
        ),
    ),
    "ln": (1, lambda a: F.log(a)),
    "log10": (1, lambda a: F.log10(a)),
    "logn": (2, lambda base, x: F.log(x) / F.log(base)),  # MathUtil.log(base, x):50-52
    "max": (2, lambda a, b: F.greatest(a, b)),
    "min": (2, lambda a, b: F.least(a, b)),
    "pow": (2, lambda a, b: F.pow(a, b)),
    "sin": (1, lambda a: F.sin(a)),
    "sinh": (1, lambda a: F.sinh(a)),
    "sqrt": (1, lambda a: F.sqrt(a)),
    "tan": (1, lambda a: F.tan(a)),
    "tanh": (1, lambda a: F.tanh(a)),
}


class _Parser:
    """Precedence-climbing parser over the Javascript.g4 operator ladder."""

    # binary precedence, higher binds tighter (unary handled separately)
    _PREC = {
        "*": 110, "/": 110, "%": 110,
        "+": 100, "-": 100,
        "<<": 90, ">>": 90, ">>>": 90,
        "<": 80, "<=": 80, ">": 80, ">=": 80,
        "==": 70, "!=": 70,
        "&": 60, "^": 50, "|": 40,
        "&&": 30, "||": 20,
    }

    def __init__(self, toks, resolver: Callable[[str], Column], functions: dict):
        self.toks = toks
        self.i = 0
        self.resolver = resolver
        self.functions = functions

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, op: str):
        k, v = self.next()
        if k != "op" or v != op:
            raise ValueError(f"expected {op!r}, got {v!r}")

    def parse(self) -> Column:
        out = self.ternary()
        if self.peek()[0] != "end":
            raise ValueError(f"trailing input at token {self.peek()!r}")
        return out

    def ternary(self) -> Column:
        cond = self.binary(0)
        if self.peek() == ("op", "?"):
            self.next()
            then = self.ternary()
            self.expect(":")
            other = self.ternary()  # right-assoc
            return F.when(_bool(cond), then).otherwise(other)
        return cond

    def binary(self, min_prec: int) -> Column:
        left = self.unary()
        while True:
            k, v = self.peek()
            if k != "op" or v not in self._PREC or self._PREC[v] < min_prec:
                return left
            self.next()
            right = self.binary(self._PREC[v] + 1)
            left = self._apply(v, left, right)

    def _apply(self, op: str, a: Column, b: Column) -> Column:
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "%":
            return a % b
        if op == "<<":
            return _long_op(a, b.cast("int"), lambda x, n: F.call_function("shiftleft", x, n))
        if op == ">>":
            return _long_op(a, b.cast("int"), lambda x, n: F.call_function("shiftright", x, n))
        if op == ">>>":
            return _long_op(a, b.cast("int"), lambda x, n: F.call_function("shiftrightunsigned", x, n))
        if op in ("<", "<=", ">", ">=", "==", "!="):
            cond = {
                "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                "==": a == b, "!=": a != b,
            }[op]
            return _as01(cond)
        if op == "&":
            return _d(a.cast("long").bitwiseAND(b.cast("long")))
        if op == "^":
            return _d(a.cast("long").bitwiseXOR(b.cast("long")))
        if op == "|":
            return _d(a.cast("long").bitwiseOR(b.cast("long")))
        if op == "&&":
            return _as01(_bool(a) & _bool(b))
        if op == "||":
            return _as01(_bool(a) | _bool(b))
        raise AssertionError(op)

    def unary(self) -> Column:
        k, v = self.peek()
        if k == "op" and v in ("!", "~", "+", "-"):
            self.next()
            x = self.unary()
            if v == "!":
                return _as01(~_bool(x))
            if v == "~":
                return _d(x.cast("long").bitwiseXOR(F.lit(-1).cast("long")))
            if v == "-":
                return -x
            return x
        return self.primary()

    def primary(self) -> Column:
        k, v = self.next()
        if k == "num":
            return _d(v)
        if k == "op" and v == "(":
            e = self.ternary()
            self.expect(")")
            return e
        if k == "var":
            if self.peek() == ("op", "("):  # function call
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.ternary())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.ternary())
                self.expect(")")
                if v not in self.functions:
                    raise ValueError(f"unknown function {v!r}")
                arity, fn = self.functions[v]
                if len(args) != arity:
                    raise ValueError(f"{v} expects {arity} args, got {len(args)}")
                return _d(fn(*[_d(a) for a in args]))
            return _d(self.resolver(v))
        raise ValueError(f"unexpected token {v!r}")


def compile_expression(
    src: str,
    resolver: Optional[Callable[[str], Column]] = None,
    functions: Optional[dict] = None,
) -> Column:
    """Compile a JS-like expression to a double Column.

    ``resolver`` binds variables (``_score``, field names) to Columns —
    default is ``F.col``.  ``functions`` extends/overrides
    :data:`DEFAULT_FUNCTIONS` (the ``JavascriptCompiler.properties``
    registry)."""
    fns = dict(DEFAULT_FUNCTIONS)
    if functions:
        fns.update(functions)
    return _Parser(_tokenize(src), resolver or F.col, fns).parse()
