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


def weighted_median(
    df: DataFrame,
    keys: list[str],
    value: str,
    weight: str,
    tiebreak: list[str] = (),
) -> DataFrame:
    """Per-key weighted median: the smallest value whose cumulative weight
    reaches half the key's total (the lower weighted median — exact, order-
    statistic form). Plain `median` treats a 1-second and a 1-hour reading
    alike; weighting by duration/quantity/tokens makes the estimate
    physically meaningful for irregular data.

    One shuffle on the key serving a cumulative-sum window in (value,
    tiebreak) order + a rank-1 filter over the crossing point; the total
    joins back from a key agg (AQE-decided — the per-key frame is data-
    dependent, never hint-broadcast). Returns (keys..., wmedian, total_w).
    """
    order = [F.col(value), *[F.col(c) for c in tiebreak]]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = df.groupBy(*keys).agg(F.sum(weight).alias("_tw"))
    cum = df.withColumn("_cw", F.sum(weight).over(w_cum)).join(tot, list(keys))
    crossed = cum.filter(F.col("_cw") * 2 >= F.col("_tw"))
    w_pick = Window.partitionBy(*keys).orderBy(*order)
    return (
        crossed.withColumn("_rk", F.row_number().over(w_pick))
        .filter(F.col("_rk") == 1)
        .select(
            *keys,
            F.col(value).alias("wmedian"),
            F.col("_tw").alias("total_w"),
        )
    )


def psi_drift(
    df: DataFrame,
    keys: list[str],
    value: str,
    split_pred,
    bin_width: float,
    n_bins: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Population stability index between a reference slice (``split_pred``
    true) and a comparison slice, over FIXED-width value bins:

        PSI = Σ_b (p_cmp(b) − p_ref(b)) · ln(p_cmp(b) / p_ref(b))

    with add-α smoothing so empty bins stay finite. PSI is the standard
    "has this feature's distribution moved" monitor (credit-scoring rule of
    thumb: <0.1 stable, >0.25 investigate); fixed bins keep the boundaries
    engine-independent (quantile bins would couple the monitor to a
    percentile implementation). Returns (keys..., psi, n_ref, n_cmp).

    One partial+final agg over (keys, slice, bin) — linear, map-side
    combined; the per-key bin frame is O(keys × n_bins).

    r7 edge pinning: NULL values are DROPPED (F.least SKIPS null args, so
    an unguarded NULL binned into the TOP bin — phantom drift); negative
    values clamp to bin 0 (the grid is [0, n_bins) as documented). Bins
    unobserved in BOTH slices are omitted from the sum — their smoothed
    term is nonzero only when the two slice sizes differ, and the DuckDB
    oracle replays the same observed-bin construction, so the reported
    value is the observed-bin PSI (stated, not hidden).
    """
    bin_col = F.greatest(
        F.least(
            F.floor(F.col(value) / F.lit(bin_width)).cast("long"),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )
    binned = df.filter(F.col(value).isNotNull()).select(
        *keys,
        bin_col.alias("_bin"),
        F.when(split_pred, 1).otherwise(0).alias("_ref"),
    )
    counts = binned.groupBy(*keys, "_bin").agg(
        F.sum("_ref").alias("_nr"),
        F.sum(1 - F.col("_ref")).alias("_nc"),
    )
    tot = counts.groupBy(*keys).agg(
        F.sum("_nr").alias("_tr"), F.sum("_nc").alias("_tc")
    )
    a = float(alpha)
    b = float(n_bins)
    scored = counts.join(tot, list(keys)).withColumn(
        "_pr", (F.col("_nr") + a) / (F.col("_tr") + F.lit(a * b))
    ).withColumn(
        "_pc", (F.col("_nc") + a) / (F.col("_tc") + F.lit(a * b))
    )
    return scored.groupBy(*keys).agg(
        F.round(
            F.sum((F.col("_pc") - F.col("_pr")) * F.log(F.col("_pc") / F.col("_pr"))),
            4,
        ).alias("psi"),
        F.sum("_nr").alias("n_ref"),
        F.sum("_nc").alias("n_cmp"),
    )


def trimmed_mean(
    df: DataFrame,
    keys: list[str],
    value: str,
    trim: float = 0.1,
    tiebreak: list[str] = (),
) -> DataFrame:
    """Per-key trimmed mean: drop the lowest and highest ``floor(n·trim)``
    rows (by value with a deterministic tiebreak) and average the rest —
    the classic robust location estimate between the mean (trim=0) and the
    median (trim→0.5), immune to the tail garbage a plain mean chases.

    One shuffle on the key serving both the row_number window and the
    count; the kept-slice mean is a partial+final agg. Returns
    (keys..., trimmed_mean, n_used). Cross-engine note: the picked slice is
    exact (integer rank bounds); only the final mean is a float agg —
    callers round per repo convention.

    ``trim`` must be in [0, 0.5): at 0.5 an even-count key keeps ZERO rows
    (cut = n/2 from each side) and silently vanishes from the output — use
    an exact median for the limit case (r7 guard).
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(
            f"trim must be in [0, 0.5) — at 0.5 even-count keys keep no rows "
            f"and drop from the output (got {trim}); use median instead"
        )
    order = [F.col(value), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    wc = Window.partitionBy(*keys)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    cut = F.floor(F.col("_n") * F.lit(float(trim)))
    kept = ranked.filter(
        (F.col("_rn") > cut) & (F.col("_rn") <= F.col("_n") - cut)
    )
    return kept.groupBy(*keys).agg(
        F.avg(value).alias("trimmed_mean"),
        F.count(F.lit(1)).alias("n_used"),
    )


def autocorrelation(
    series: DataFrame,
    keys: list[str],
    t_col: str,
    x_col: str,
    lags: list[int],
) -> DataFrame:
    """Per-key lag-ℓ autocorrelation over an integer-valued series indexed
    by an integer time grid (calendar-lag semantics: x_t pairs with
    x_{t+ℓ} when BOTH grid points exist — gaps drop pairs rather than
    silently pairing non-adjacent rows, unlike a row-order lag()):

        r_ℓ = Σ_pairs (x_t − x̄)(x_{t+ℓ} − x̄) / Σ_all (x_t − x̄)²

    with x̄ the full-series mean. All aggregates (Σxy, Σx, Σx², pair and
    series counts) are EXACT integer sums; r_ℓ is assembled from them in
    one identical double expression, so the 4dp round is cross-engine
    stable — the same integer-first discipline as resample_interpolated.

    Shape: the lagged pairing is an equi-join of the series with itself
    shifted by each lag (the lag dim is a literal, broadcast side of a
    crossJoin), grouped per (key, lag); plus one per-key moment agg joined
    back (AQE-decided). Everything shuffles on the key — linear, no
    windows, no dense-grid requirement. Returns (keys..., lag, acf,
    n_pairs).
    """
    spark = series.sparkSession
    lag_dim = spark.createDataFrame([(int(l),) for l in lags], "lag long")
    s = series.select(*keys, F.col(t_col).alias("_t"), F.col(x_col).alias("_x"))
    moments = s.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s1"),
        F.sum(F.col("_x") * F.col("_x")).alias("_s2"),
    )
    left = s.crossJoin(F.broadcast(lag_dim)).withColumn(
        "_tr", F.col("_t") + F.col("lag")
    )
    right = s.select(
        *[F.col(c).alias(f"_r_{c}") for c in keys],
        F.col("_t").alias("_tr"),
        F.col("_x").alias("_xr"),
    )
    pair_cond = [F.col(c) == F.col(f"_r_{c}") for c in keys]
    pairs = left.join(right, [*pair_cond, left["_tr"] == right["_tr"]])
    pagg = pairs.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(F.col("_x") * F.col("_xr")).alias("_sxy"),
        F.sum("_x").alias("_sl"),
        F.sum("_xr").alias("_sr"),
    )
    out = pagg.join(moments, list(keys))
    mean = F.col("_s1").cast("double") / F.col("_n")
    num = (
        F.col("_sxy").cast("double")
        - mean * F.col("_sl")
        - mean * F.col("_sr")
        + F.col("_c") * mean * mean
    )
    den = F.col("_s2").cast("double") - F.col("_n") * mean * mean
    return out.select(
        *keys,
        "lag",
        F.round(num / den, 4).alias("acf"),
        F.col("_c").alias("n_pairs"),
    )


def ks_statistic(
    df: DataFrame,
    keys: list[str],
    value: str,
    split_pred,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per key between the
    reference slice (``split_pred`` true) and the comparison slice:
    D = sup_x |F_ref(x) − F_cmp(x)|, computed EXACTLY — the order-statistic
    drift monitor next to :func:`psi_drift`'s binned PSI (KS needs no bin
    choice and catches shape changes PSI's fixed grid can blur).

    Shape: reduce to per-(key, distinct value) counts first (the series
    compresses to its value support), then ONE cumulative-sum window per
    key in value order and a max agg. Every ECDF step is an integer ratio
    (cum/total), so D is deterministic cross-engine; callers round at the
    query edge. Returns (keys..., ks, n_ref, n_cmp).

    NULL values are DROPPED (r7): an ECDF is defined over values, and a
    NULL group would sort NULLS FIRST in Spark's cumulative but NULLS
    LAST in the DuckDB oracle's ORDER BY — shifting every intermediate
    step and diverging D cross-engine the moment a NULL appears.
    """
    tagged = df.filter(F.col(value).isNotNull()).select(
        *keys,
        F.col(value).alias("_v"),
        F.when(split_pred, 1).otherwise(0).alias("_ref"),
    )
    per_val = tagged.groupBy(*keys, "_v").agg(
        F.sum("_ref").alias("_ca"),
        F.sum(1 - F.col("_ref")).alias("_cb"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*keys)
    cum = per_val.withColumn("_cuma", F.sum("_ca").over(w)).withColumn(
        "_cumb", F.sum("_cb").over(w)
    ).withColumn("_na", F.sum("_ca").over(wt)).withColumn(
        "_nb", F.sum("_cb").over(wt)
    )
    d = cum.withColumn(
        "_d",
        F.abs(
            F.col("_cuma").cast("double") / F.col("_na")
            - F.col("_cumb").cast("double") / F.col("_nb")
        ),
    )
    return d.groupBy(*keys).agg(
        F.max("_d").alias("ks"),
        F.max("_na").alias("n_ref"),
        F.max("_nb").alias("n_cmp"),
    )


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson χ² test of independence over the (row_col × col_col)
    contingency table: χ² = Σ_cells (O − E)² / E with E = (row total ×
    column total) / N — the categorical-drift / association monitor
    (is event mix independent of weekday?).

    Three linear aggs (cell, row-margin, column-margin — each map-side
    combined) + margin equi-joins back onto the OBSERVED cells only; the
    1-row N is a broadcast crossJoin (exempt from the sf-scaled-hint rule
    — a global aggregate is one row at any scale). EMPTY cells are never
    materialized: their contribution is (0−E)²/E = E, and ΣE over the full
    grid is N, so χ² = Σ_observed (O−E)²/E + (N − Σ_observed E) — exact,
    and the sparse-grid form survives high-cardinality categories where a
    margin×margin grid rebuild would explode. All counts are exact
    integers; χ² is one float sum over the observed cells, rounded by the
    caller per repo convention. Returns one row (chi2 unrounded, dof, n).

    NULL categories are DROPPED up front (r7): they were counted in N but
    never equi-joined their margins, so their whole mass surfaced as
    spurious χ² through the sparse-grid (N − ΣE) term while countDistinct
    excluded them from dof. A test over "unknown" categories should
    recode NULL to an explicit level first.
    """
    df = df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("_o"))
    rows = df.groupBy(row_col).agg(F.count(F.lit(1)).alias("_rt"))
    cols = df.groupBy(col_col).agg(F.count(F.lit(1)).alias("_ct"))
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    j = (
        cells.join(rows, row_col)
        .join(cols, col_col)
        .crossJoin(F.broadcast(n))
    )
    e = F.col("_rt").cast("double") * F.col("_ct") / F.col("_n")
    contrib = (F.col("_o") - e) * (F.col("_o") - e) / e
    stats = j.agg(
        F.sum(contrib).alias("_chi2_obs"),
        F.sum(e).alias("_e_obs"),
        F.countDistinct(row_col).alias("_r"),
        F.countDistinct(col_col).alias("_c"),
        F.max("_n").alias("n"),
    )
    return stats.select(
        (F.col("_chi2_obs") + (F.col("n") - F.col("_e_obs"))).alias("chi2"),
        ((F.col("_r") - 1) * (F.col("_c") - 1)).alias("dof"),
        "n",
    )


# Poisson(1) CDF thresholds scaled to the 60-bit md5 hash space
# (floor(CDF_k * 2^60), k = 0..3; mass above CDF_3 draws weight 4).
# Precomputed INTEGER literals spliced into BOTH engines, so the inverse-CDF
# draw is pure integer comparison — no float library involvement anywhere.
POISSON1_CDF_E60 = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
)


def poisson_bootstrap_sums(
    df: DataFrame,
    key_col: str,
    value_col: str,
    replicates: int = 20,
    salt: str = "boot",
) -> DataFrame:
    """ONE-PASS Poisson bootstrap: the cluster-scale uncertainty-
    quantification technique (Chamandy et al., 'Estimating Uncertainty for
    Massive Data Streams', Google TR 2012). Classical bootstrap resamples
    n rows WITH replacement B times — O(B·n) shuffled rows and a global
    sample per replicate, impossible at 100 TB. The Poisson approximation
    draws each row's multiplicity in each replicate as iid Poisson(1)
    (binomial(n, 1/n) → Poisson(1)), making every row's contribution
    independent: one linear pass computes ALL B replicate sums with
    map-side combine, shuffling only B rows per partition.

    Weights are drawn DETERMINISTICALLY: w = inverse-Poisson-CDF of the
    row's salted 60-bit md5 residue, via precomputed integer thresholds
    (``POISSON1_CDF_E60``) — reproducible anywhere, engine-exact, and
    capped at 4 (mass 3.7e-5 truncated; bias far below bootstrap noise).
    Returns one row per replicate: (b, n_eff, total) — exact BIGINTs from
    which the caller derives replicate means and percentile CIs.
    """
    rows = df.select(
        F.col(key_col).cast("string").alias("_k"), F.col(value_col).alias("_v")
    ).select(
        "_k",
        "_v",
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("b"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt), F.col("b").cast("string"), F.lit(":"), F.col("_k")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    t = POISSON1_CDF_E60
    w = (
        F.when(h < t[0], 0)
        .when(h < t[1], 1)
        .when(h < t[2], 2)
        .when(h < t[3], 3)
        .otherwise(4)
        .cast("long")
    )
    return (
        rows.select(F.col("b").cast("long").alias("b"), w.alias("_w"), "_v")
        .groupBy("b")
        .agg(
            F.sum("_w").cast("long").alias("n_eff"),
            F.sum(F.col("_w") * F.col("_v")).cast("long").alias("total"),
        )
    )


def mad_outliers(
    df: DataFrame,
    keys: list[str],
    value: str,
    tiebreak: str,
    z: int = 3,
) -> DataFrame:
    """Per-key median-absolute-deviation outlier audit over INTEGER values,
    kept exact end-to-end with the doubled-median trick:

        m2    = lo + hi            (2 × median; lo/hi are the two middle
                                    order statistics, equal when n is odd)
        d2_i  = |2·v_i − m2|       (2 × |v_i − median|, still integer)
        mad22 = lo' + hi' over d2  (4 × MAD)
        outlier_i  ⇔  |v_i − median| > z·MAD  ⇔  2·d2_i > z·mad22

    No halves are ever materialized, so the whole audit is BIGINT-exact and
    replays bit-identically cross-engine (the classic robust-statistics
    outlier gate — Hampel/Iglewicz-Hoaglin — without the float z-score).
    The exact-integer twin of :func:`mad_outlier_summary` above: that one
    reports float interpolated percentiles with the 1.4826 Gaussian
    consistency factor; this one trades the sigma scaling for a typed-hash-
    exact contract (z applies to raw MAD) on integer-quantized values.

    Plan: both rank windows and both aggregates partition on ``keys``, so
    ONE exchange serves the entire audit (the second window re-sorts within
    the same partitioning); the median row-pick is conditional aggregation
    against a window count, never a self-join. Returns
    (keys..., n, median2, mad4, n_outliers, max_dev2)."""
    w_n = Window.partitionBy(*keys)
    w_v = Window.partitionBy(*keys).orderBy(value, tiebreak)
    ranked = df.select(
        *keys,
        F.col(value).alias("_v"),
        F.col(tiebreak).alias("_tb"),
        F.row_number().over(w_v).cast("long").alias("_rk"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("_n"),
    )
    lo_rk = F.expr("(_n + 1) div 2")
    hi_rk = F.expr("_n div 2 + 1")
    med = ranked.groupBy(*keys).agg(
        (
            F.sum(F.when(F.col("_rk") == lo_rk, F.col("_v")).otherwise(0))
            + F.sum(F.when(F.col("_rk") == hi_rk, F.col("_v")).otherwise(0))
        )
        .cast("long")
        .alias("median2"),
        F.max("_n").cast("long").alias("n"),
    )
    dev = ranked.join(med, list(keys)).select(
        *keys,
        "n",
        "median2",
        "_tb",
        F.abs(F.lit(2) * F.col("_v") - F.col("median2")).cast("long").alias("_d2"),
    )
    w_d = Window.partitionBy(*keys).orderBy("_d2", "_tb")
    dranked = dev.withColumn("_rk2", F.row_number().over(w_d).cast("long"))
    lo2 = F.expr("(n + 1) div 2")
    hi2 = F.expr("n div 2 + 1")
    mad = dranked.groupBy(*keys).agg(
        F.max("n").cast("long").alias("n_"),
        F.max("median2").cast("long").alias("median2_"),
        (
            F.sum(F.when(F.col("_rk2") == lo2, F.col("_d2")).otherwise(0))
            + F.sum(F.when(F.col("_rk2") == hi2, F.col("_d2")).otherwise(0))
        )
        .cast("long")
        .alias("mad4"),
    )
    flagged = dev.join(mad, list(keys)).groupBy(*keys).agg(
        F.max("n_").cast("long").alias("n"),
        F.max("median2_").cast("long").alias("median2"),
        F.max("mad4").cast("long").alias("mad4"),
        F.sum(
            (F.lit(2) * F.col("_d2") > F.lit(z) * F.col("mad4")).cast("long")
        )
        .cast("long")
        .alias("n_outliers"),
        F.max("_d2").cast("long").alias("max_dev2"),
    )
    return flagged
