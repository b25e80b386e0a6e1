"""Declarative data-quality constraint suite (Deequ-style, §2 extension).

Before a 100 TB table feeds training or analytics, a validation pass runs a
SUITE of constraints — completeness, uniqueness, value ranges, set
membership, referential integrity — and emits one report row per
constraint: (check_name, metric, passed). This is the unit-test layer for
DATA (AWS Deequ / Great Expectations shape), absent from the reference
(whose loaders assume clean inputs) but mandatory at pipeline scale.

Scale shape: every metric that is a single-pass aggregate is computed in
ONE `agg` over the table (one scan, one 1-row result — Deequ's own
"metrics computation is one pass" design), then unpivoted to report rows
via `stack`. Referential-integrity constraints need a join, so each one
adds one left-anti count against its dimension; the dim side is
AQE-decided (customer grows with sf — never hint-broadcast, repo rule).
The report itself is O(#constraints) rows — trivially collectable,
alertable, and appendable to a run-history table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.exact_math import ratio_scaled


@dataclass(frozen=True)
class AggCheck:
    """A constraint whose metric is a single-pass aggregate expression."""

    name: str
    metric: Column  # aggregate expression over the checked table
    # predicate over the metric value, applied to decide pass/fail
    lo: float | None = None  # metric >= lo
    hi: float | None = None  # metric <= hi


def _passed(metric: Column, lo: float | None, hi: float | None) -> Column:
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (metric >= F.lit(lo))
    if hi is not None:
        cond = cond & (metric <= F.lit(hi))
    return cond


def _exact_ratio6(num_sql: str, den_sql: str) -> Column:
    """Ratio metric as (exact e6 integer)/1e6: the integer round happens in
    64-bit integer space (operators/exact_math.py) and k/1e6 is the SAME
    IEEE division in Spark and DuckDB, so the 6dp metric can never diverge
    on a decimal half-boundary (the r4/r5 cross-engine round trap)."""
    return ratio_scaled(num_sql, den_sql, 6).cast("double") / F.lit(1000000.0)


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value (Deequ Completeness)."""
    return _exact_ratio6(f"count({col})", "count(1)")


def uniqueness(col: str) -> Column:
    """Fraction of rows whose key value is globally unique would need a
    second agg; the standard scalable proxy is distinct/total (Deequ
    UniqueValueRatio ≈ 1 ⇔ key is unique)."""
    return _exact_ratio6(f"count(distinct {col})", "count(1)")


def in_set_ratio(col: str, allowed: list[str]) -> Column:
    """Fraction of rows whose value is in the allowed set.

    Values are embedded as SQL string literals with single quotes doubled,
    so names like O'Brien cannot break (or alter) the generated predicate.
    """
    in_list = ", ".join("'{}'".format(str(a).replace("'", "''")) for a in allowed)
    return _exact_ratio6(
        f"sum(case when {col} in ({in_list}) then 1 else 0 end)", "count(1)"
    )


def check_report(
    df: DataFrame,
    agg_checks: list[AggCheck],
    ref_checks: list[tuple[str, str, DataFrame, str]] = (),
) -> DataFrame:
    """Run the suite; returns (check_name, metric, passed) — metric rounded
    to 6dp (ratios and bounds are the only doubles; counts arrive exact).

    ``ref_checks``: (name, fk_col, dim_df, pk_col) — referential integrity,
    metric = orphan-row count (passed ⇔ 0). Each adds one left-anti join;
    all single-pass metrics share ONE scan.
    """
    one = df.agg(
        *[F.round(c.metric, 6).alias(f"_m{i}") for i, c in enumerate(agg_checks)],
        *[
            _passed(F.round(c.metric, 6), c.lo, c.hi).alias(f"_p{i}")
            for i, c in enumerate(agg_checks)
        ],
    )
    stack_args = ", ".join(
        f"'{c.name}', _m{i}, _p{i}" for i, c in enumerate(agg_checks)
    )
    report = one.selectExpr(
        f"stack({len(agg_checks)}, {stack_args}) AS (check_name, metric, passed)"
    )
    for name, fk, dim, pk in ref_checks:
        orphans = (
            df.select(F.col(fk)).filter(F.col(fk).isNotNull())
            .join(dim.select(F.col(pk).alias(fk)), fk, "left_anti")
            .agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).cast("double").alias("metric"),
                (F.count(F.lit(1)) == 0).alias("passed"),
            )
        )
        report = report.unionByName(orphans)
    return report
