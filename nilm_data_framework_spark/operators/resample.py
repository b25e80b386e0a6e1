"""A1 time-bucket resample + A6 sample-rate inference + upsample guard.

Reference semantics:
  - ``Channel.resample`` (UnifiedNILM/UnifiedNILM.py:66-124): pandas
    ``resample(rate).mean()`` — i.e. tumbling windows aligned to the epoch,
    mean per bucket, *empty buckets dropped* (pandas emits NaN rows; the
    framework's downstream fillna(0) handles them — we keep the long-format
    convention of no row for an empty bucket).
  - Upsample guard (UnifiedNILM.py:118-120): if the target rate is finer
    than the inferred current rate, skip resampling.
  - Rate inference (REFITLoader.py:82-89, UKDALELoader.py:77-82,
    OlaLoader.py:21-30, UnifiedNILM.py:96-109): median of positive
    consecutive timestamp deltas, in whole seconds.

Spark shape: ``window(ts, '<n> seconds')`` tumbling agg — a single shuffle on
the grouping keys; partial aggregation (map-side combine) happens
automatically. Rate inference is a lag-window + exact median, one shuffle per
key. Both scale linearly: no driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def infer_sample_rate(
    readings: DataFrame,
    keys: list[str],
    ts: str = "ts",
) -> DataFrame:
    """A6: per-key median of positive consecutive timestamp deltas (seconds).

    Returns one row per key: ``keys..., rate_s double``. Uses exact
    ``median`` (not percentile_approx) so results are oracle-checkable; at
    100 TB swap to ``percentile_approx`` via the ``approx`` arg of
    :func:`infer_sample_rate_approx`.
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    delta = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    return (
        readings.withColumn("_delta_s", delta)
        .filter(F.col("_delta_s") > 0)
        .groupBy(*keys)
        .agg(F.expr("median(_delta_s)").alias("rate_s"))
    )


def infer_sample_rate_approx(
    readings: DataFrame, keys: list[str], ts: str = "ts", accuracy: int = 10000
) -> DataFrame:
    """Scale path for A6: percentile_approx median (mergeable sketch, no
    full sort of deltas per key)."""
    w = Window.partitionBy(*keys).orderBy(ts)
    delta = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    return (
        readings.withColumn("_delta_s", delta)
        .filter(F.col("_delta_s") > 0)
        .groupBy(*keys)
        .agg(F.percentile_approx("_delta_s", F.lit(0.5), F.lit(accuracy)).alias("rate_s"))
    )


def resample_mean(
    readings: DataFrame,
    keys: list[str],
    seconds: int,
    ts: str = "ts",
    value: str = "power",
    out_value: str = "power",
) -> DataFrame:
    """A1: downsample to ``seconds``-wide tumbling buckets by mean.

    Output: ``keys..., bucket_ts timestamp, <out_value> double`` — bucket_ts
    is the window start (epoch-aligned, matching pandas ``resample`` and
    DuckDB ``time_bucket``). Empty buckets are absent (long-format).
    """
    return (
        readings.groupBy(*keys, F.window(F.col(ts), f"{seconds} seconds").alias("_w"))
        .agg(F.avg(value).alias(out_value))
        .withColumn("bucket_ts", F.col("_w.start"))
        .drop("_w")
        .select(*keys, "bucket_ts", out_value)
    )


def resample_mean_guarded(
    readings: DataFrame,
    keys: list[str],
    seconds: int,
    ts: str = "ts",
    value: str = "power",
) -> DataFrame:
    """A1 with the reference's upsample guard (UnifiedNILM.py:118-120).

    Keys whose inferred native rate is already coarser than ``seconds`` are
    passed through un-resampled (the reference skips them); everything else
    is bucketed. Implemented as a join of the per-key inferred rate — a
    metadata-driven plan step, not a Catalyst rule. The rate table scales
    with key count, so the join strategy is left to AQE (no forced hint).
    """
    # `rates` has one row per key — key cardinality grows with data size, so
    # no forced broadcast; AQE converts to broadcast at runtime when small.
    rates = infer_sample_rate(readings, keys, ts)
    tagged = readings.join(rates, on=keys, how="left")
    fine = tagged.filter((F.col("rate_s").isNull()) | (F.col("rate_s") <= seconds))
    coarse = tagged.filter(F.col("rate_s") > seconds)
    resampled = resample_mean(fine.drop("rate_s"), keys, seconds, ts, value)
    passthrough = coarse.select(
        *keys, F.col(ts).alias("bucket_ts"), F.col(value).alias("power")
    )
    return resampled.unionByName(passthrough)
