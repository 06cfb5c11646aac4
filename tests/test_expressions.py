"""JS-expression compiler (JavascriptCompiler analog): grammar, precedence,
double/long semantics, function registry, and expression rescoring."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.plans.expressions import compile_expression


def _eval1(spark, src, **vars_):
    row = spark.createDataFrame([tuple(vars_.values()) or (0,)],
                                ", ".join(f"{k} double" for k in vars_) or "dummy int")
    return row.select(compile_expression(src).alias("v")).collect()[0]["v"]


CASES = [
    ("1 + 2 * 3 - 4 / 2", 5.0),
    ("-(2 + 3) * -2", 10.0),
    ("2 * (3 + 4)", 14.0),
    ("7 % 4", 3.0),
    ("0x10 + 010", 24.0),  # hex + octal literals
    ("(5 & 3) | (1 << 4)", 17.0),
    ("~0", -1.0),
    ("-8 >> 1", -4.0),
    ("16 >>> 1", 8.0),
    ("3 > 2", 1.0),
    ("3 <= 2", 0.0),
    ("2 == 2 && 1 < 2", 1.0),
    ("0 || 0", 0.0),
    ("!3", 0.0),
    ("!0", 1.0),
    ("1 > 2 ? 10 : 20", 20.0),
    ("1 ? 0 ? 3 : 4 : 5", 4.0),  # right-assoc nesting
    ("sqrt(16) + pow(2, 3)", 12.0),
    ("min(3, 5) + max(3, 5)", 8.0),
    ("logn(2, 8)", 3.0),
    ("ln(exp(2))", 2.0),
    ("floor(2.7) + ceil(2.1)", 5.0),
    ("abs(0 - 7)", 7.0),
]


@pytest.mark.parametrize("src,want", CASES)
def test_expression_values(spark, src, want):
    assert _eval1(spark, src) == pytest.approx(want, abs=1e-12)


def test_haversin_kilometers(spark):
    # SF -> LA ~ 559 km (SloppyMath.haversinKilometers)
    got = _eval1(spark, "haversin(37.7749, -122.4194, 34.0522, -118.2437)")
    assert 556 < got < 562


def test_variables_and_calls(spark):
    df = spark.createDataFrame([(2.0, 3.0)], "x double, y double")
    col = compile_expression("sqrt(x * x + y * y) + (x > y ? x : y)")
    assert df.select(col.alias("v")).collect()[0]["v"] == pytest.approx(math.hypot(2, 3) + 3)


def test_errors():
    with pytest.raises(ValueError, match="unknown function"):
        compile_expression("nope(1)")
    with pytest.raises(ValueError, match="expects 2 args"):
        compile_expression("pow(1)")
    with pytest.raises(ValueError, match="trailing"):
        compile_expression("1 2")
    with pytest.raises(ValueError, match="unexpected"):
        compile_expression("@bad")


def test_expression_rescore_end_to_end(searcher, oracle):
    from lucene_solr_spark.plans.query import TermQuery

    term = "the"
    src = "_score * (turn_idx >= 2 ? 2 : 1) + turn_idx % 3"
    got = [(d, float(np.float32(s))) for d, s in searcher.expression_rescore(TermQuery(term), src, 10).collect()]

    # brute-force control: oracle term scores + corpus turn_idx
    rows = {r["doc_id"]: r["turn_idx"] for r in searcher.corpus.select("doc_id", "turn_idx").collect()}
    exp = []
    for doc_id, s in oracle._term_scores(term, 1.0).items():
        ti = rows[doc_id]
        v = float(s) * (2.0 if ti >= 2 else 1.0) + float(ti % 3)
        exp.append((doc_id, float(np.float32(v))))
    exp.sort(key=lambda t: (-t[1], t[0]))
    assert got == exp[:10]
