"""Cross-engine exact-ratio helper tests (operators/exact_math.py) and the
registry-wide guard against the integer-quotient rounding trap.

The trap (CLAUDE.md, VERDICT r4): ``round(int/int, d)`` of a quotient landing
exactly on a decimal half-boundary rounds differently in Spark (shortest-
string BigDecimal, HALF_UP) vs DuckDB (raw-double nearest), and DuckDB sums
of INTEGER are HUGEINT which pandas fetches as float64/object while Spark
emits int64 — both flip the driver's typed value hash while plain ``==``
comparison stays green. Every reported integer-quotient ratio therefore goes
through ratio_scaled/ratio_scaled_sql, which round in pure 64-bit integer
arithmetic, bit-identically in both engines.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from nilm_data_framework_spark.operators.exact_math import (
    ratio_e4,
    ratio_e4_sql,
    ratio_scaled,
    ratio_scaled_sql,
)
from nilm_data_framework_spark.plans.registry import all_queries

# (num, den) cases: exact values, 4dp half-boundaries (1/32 = 0.03125 →
# .03125 is a 5th-digit 5 → half case at 4dp), thirds, and big-count shapes.
CASES = [
    (0, 1), (1, 1), (1, 2), (1, 3), (2, 3), (1, 8), (1, 16),
    (1, 32), (3, 32), (5, 32), (7, 16), (1, 7), (6, 7),
    (12345, 99999), (999999, 1000000), (1, 10**9), (10**9 - 1, 10**9),
]


def _py_round_half_up_e(num: int, den: int, digits: int) -> int:
    from fractions import Fraction

    q = Fraction(num * 10**digits, den)
    floor = q.numerator // q.denominator
    rem = q - floor
    return floor + (1 if rem >= Fraction(1, 2) else 0)


@pytest.mark.parametrize("digits", [2, 4, 6])
def test_ratio_scaled_spark_matches_exact_half_up(spark, digits):
    df = spark.createDataFrame(CASES, "num long, den long")
    out = {
        (r["num"], r["den"]): r["e"]
        for r in df.select(
            "num", "den", ratio_scaled("num", "den", digits).alias("e")
        ).collect()
    }
    for num, den in CASES:
        assert out[(num, den)] == _py_round_half_up_e(num, den, digits), (
            num, den, digits,
        )


@pytest.mark.parametrize("digits", [2, 4, 6])
def test_ratio_scaled_sql_duckdb_matches_exact_half_up(digits):
    con = duckdb.connect()
    for num, den in CASES:
        expr = ratio_scaled_sql(str(num), str(den), digits)
        got = con.execute(f"SELECT {expr} AS e").fetchone()[0]
        assert got == _py_round_half_up_e(num, den, digits), (num, den, digits)


def test_ratio_e4_twins_agree_on_aggregates(spark):
    # end-to-end over an aggregate: same grouped counts through both engines
    rows = [(i % 7, 1 if i % 3 == 0 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, hit long")
    agg = df.groupBy("k").agg(
        ratio_e4("sum(hit)", "count(1)").alias("share_e4")
    )
    got = {r["k"]: r["share_e4"] for r in agg.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({k}, {h})" for k, h in rows)
        + ") v(k, hit)"
    )
    want = dict(
        con.execute(
            f"SELECT k, {ratio_e4_sql('sum(hit)', 'count(*)')} FROM t GROUP BY k"
        ).fetchall()
    )
    assert got == want


# Integer-returning aggregate expressions that make a round(x/y, d) an
# integer-quotient round — the exact cross-engine trap. Float aggregates
# (sum of prices/logs) are a different, order-sensitivity class, handled by
# the repo's round-both-sides discipline.
_INT_NUM = r"(?:CAST\s*\()?\s*(?:sum\s*\(\s*CASE|count\s*\()"


def test_no_oracle_rounds_a_bare_integer_quotient():
    """Guard: no registered oracle may emit round(<int agg>/<int agg>, d) —
    those columns must go through ratio_scaled_sql (grep for `_e4`/e6
    columns). New queries that trip this either use the helper or document
    why their quotient cannot hit a half-boundary."""
    pat = re.compile(
        r"round\s*\(\s*" + _INT_NUM + r"[^;]{0,160}?/\s*(?:CAST\s*\()?\s*"
        r"(?:sum|count)\s*\(",
        re.I | re.S,
    )
    offenders = [
        name
        for name, spec in all_queries().items()
        if spec.oracle and pat.search(spec.oracle)
    ]
    assert offenders == [], (
        f"oracles rounding bare integer quotients (use ratio_scaled_sql): "
        f"{offenders}"
    )


# --- randomized cross-engine property (hypothesis) ---------------------------


from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    num=st.integers(min_value=0, max_value=10**12),
    den=st.integers(min_value=1, max_value=10**12),
    digits=st.sampled_from([2, 4, 6]),
)
def test_ratio_scaled_sql_equals_fraction_round_half_up(num, den, digits):
    """DuckDB evaluation of ratio_scaled_sql == exact Fraction round-half-up
    for arbitrary nonnegative 64-bit-safe operands (the SQL twin carries the
    oracle side of every registered ratio, so IT is the one to fuzz)."""
    import duckdb

    got = duckdb.sql(
        f"SELECT {ratio_scaled_sql(str(num), str(den), digits)} AS e"
    ).fetchone()[0]
    assert got == _py_round_half_up_e(num, den, digits)


@settings(max_examples=40, deadline=None)  # 40 (was 100): driver budget, r10
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_ratio_scaled_spark_equals_fraction_round_half_up(spark, pairs):
    df = spark.createDataFrame(pairs, "num long, den long")
    out = df.select("num", "den", ratio_scaled("num", "den", 4).alias("e")).collect()
    for r in out:
        assert r["e"] == _py_round_half_up_e(r["num"], r["den"], 4)


def test_epoch_div_backticks_awkward_column_names(spark):
    """epoch_div splices an identifier into SQL text; names with spaces,
    dots, or hyphens must parse as ONE column reference, not break the
    parse or resolve as a struct access (r7 advice)."""
    from nilm_data_framework_spark.operators.exact_math import epoch_div

    df = spark.createDataFrame([(86401,), (172805,)], ["v"])
    for awkward in ("event ts", "event.ts", "event-ts"):
        renamed = df.withColumnRenamed("v", awkward)
        got = sorted(
            r[0] for r in renamed.select(epoch_div(awkward, 86400)).collect()
        )
        assert got == [1, 2]


def test_trunc_div_sql_matches_spark_div_on_signed(spark):
    """trunc_div_sql's sign-magnitude DuckDB form must equal Spark's
    truncate-toward-zero `div` on every sign combination (den > 0) — the
    contract the gram_power_iteration renormalization rides on. A plain
    DuckDB `//` FLOORS and would differ on every negative inexact
    quotient."""
    import duckdb

    from nilm_data_framework_spark.operators.exact_math import trunc_div_sql

    from pyspark.sql import functions as F

    cases = [(-7, 2), (-8, 2), (-1, 3), (7, 2), (0, 5), (-1000001, 1024)]
    df = spark.createDataFrame(cases, "num long, den long")
    got_spark = {
        (r["num"], r["den"]): r["q"]
        for r in df.select("num", "den", F.expr("num div den").alias("q")).collect()
    }
    con = duckdb.connect()
    got_duck = {
        (n, d): con.execute(f"SELECT {trunc_div_sql(str(n), str(d))}").fetchone()[0]
        for n, d in cases
    }
    floored = {(n, d): n // d for n, d in cases}
    assert got_spark == got_duck
    assert got_duck != floored  # the trap is real: plain floor diverges
