"""Robust statistics & sequential monitoring over readings (§2.4 extensions).

The reference's outlier handling is a fixed interval filter
(visualize_sampling_rate.ipynb cell 0) and hard clips
(postprocessing.py:32-42); production meter fleets need *adaptive* rules:

- **mad_outlier_summary** — median-absolute-deviation outlier counts per
  key. The MAD is the standard robust scale estimate (breakdown point 50%,
  vs 0% for stddev): one appliance spike can't inflate the threshold that
  is supposed to catch appliance spikes. Consistency factor 1.4826 makes
  k·MAD comparable to k·σ under normality.
- **cusum_summary** — tabular CUSUM drift detection against a known target
  level: the running sum of (value − target) crosses ±h when the process
  mean shifts, long before any per-point threshold fires. The classic SPC
  changepoint screen, here as a per-key running window.

Shapes: MAD is two grouped exact percentiles with a broadcast-dim join
between (per-key medians are a tiny dim vs the fact table); at 100 TB swap
`percentile` for `percentile_approx` — the repo's `approx_quantile_check`
attests that swap's error bound. CUSUM is one window shuffle per key; the
prefix sum is evaluated in event order, so the doubles are bit-identical in
any engine that walks the same order (unlike grouped sums, whose partial-
aggregation order is nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# MAD→σ consistency factor for the normal distribution (1/Φ⁻¹(3/4)).
MAD_SIGMA = 1.4826


def mad_outlier_summary(
    df: DataFrame, keys: list[str], value: str, k: float = 3.0
) -> DataFrame:
    """Per-key robust outlier screen: median, MAD, and the count of rows
    outside median ± k·1.4826·MAD. Exact interpolated percentiles (matching
    DuckDB ``median``); the two per-key stat frames are broadcast back onto
    the fact scan."""
    # The per-key stat frames are bounded by the key domain (a dim, not the
    # fact table), but they DERIVE from the sf-scaled input, so no forced
    # broadcast hint — AQE elects broadcast from their measured (tiny) size
    # at runtime (repo rule: test_no_broadcast_hint_over_sf_scaled_relation).
    med = df.groupBy(*keys).agg(F.percentile(value, 0.5).alias("_med"))
    with_med = df.join(med, keys)
    mad = with_med.groupBy(*keys).agg(
        F.percentile(F.abs(F.col(value) - F.col("_med")), 0.5).alias("_mad"),
        F.first("_med").alias("_med2"),
    )
    scored = df.join(mad, keys)
    thresh = F.lit(k) * F.lit(MAD_SIGMA) * F.col("_mad")
    return scored.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.abs(F.col(value) - F.col("_med2")) > thresh, 1).otherwise(0)
        ).alias("n_outliers"),
        F.round(F.first("_med2"), 4).alias("med"),
        F.round(F.first("_mad"), 4).alias("mad"),
    )


def cusum_summary(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value: str,
    target: float,
    threshold: float,
) -> DataFrame:
    """Per-key CUSUM against a KNOWN target level (the textbook SPC form —
    using a *computed* mean would couple every row's flag to a partial-agg
    rounding of the mean and break cross-engine determinism; the monitored
    target is a design parameter anyway). Returns per key: n, the count of
    points whose |running sum of (value − target)| exceeds ``threshold``,
    and the peak |CUSUM| (2dp)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = F.sum(F.col(value) - F.lit(target)).over(w)
    scored = df.withColumn("_cusum", cusum)
    return scored.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.abs(F.col("_cusum")) > threshold, 1).otherwise(0)
        ).alias("n_drifted"),
        F.round(F.max(F.abs(F.col("_cusum"))), 2).alias("peak_cusum"),
    )
