"""Tensorization-pipeline queries (reference entry point 3: H5 → windows →
tensors) plus the P8 unpivot. The windowed exports return array columns →
rows-only driver checks; their numeric parity is pinned by
tests/test_tensorize.py against NumPy oracles and the SQL window variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators import windows as W
from nilm_data_framework_spark.operators.tensorize import tensorize
from nilm_data_framework_spark.plans.registry import query
from nilm_data_framework_spark.sources.testdata import load_table


# --- W4 scale path: applyInPandas windows (same summary as sliding_windows) -----

@query(
    "sliding_windows_grouped",
    oracle="""
    WITH pos AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS p,
             count(*) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wn,
             sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS ws
      FROM events
    )
    SELECT user_id, CAST(p / 4 AS BIGINT) AS window_id,
           round(ws, 2) AS win_sum, wn AS win_len
    FROM pos WHERE p % 4 = 0 AND wn = 8
    """,
    survey_ref="§2.5 W4 scale path (applyInPandas per series; channel_utils.py:180-188)",
)
def sliding_windows_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wins = W.sliding_windows_grouped(
        ev, keys=["user_id"], seq_len=8, step=4, ts=["ts", "event_id"], value="value"
    )
    return wins.select(
        "user_id",
        "window_id",
        F.round(F.aggregate("x", F.lit(0.0), lambda a, v: a + v), 2).alias("win_sum"),
        F.size("x").cast("long").alias("win_len"),
    )


# --- full tensor export (J6 + W7 + W4 + S10 shape) --------------------------------

def _tensorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tensorize(
        ev,
        house="user_id",
        label="event_type",
        ts=["ts", "event_id"],
        value="value",
        aggregate_label="view",
        target_labels=["click", "purchase"],
        seq_len=8,
        step=4,
    )


@query(
    "tensor_export",
    oracle="""
    WITH series AS (
      SELECT user_id, event_type, list(value ORDER BY ts, event_id) AS v
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id, event_type
    ),
    per_user AS (
      SELECT user_id,
             any_value(v) FILTER (event_type = 'view') AS agg,
             any_value(v) FILTER (event_type = 'click') AS click,
             any_value(v) FILTER (event_type = 'purchase') AS purch
      FROM series GROUP BY user_id
    ),
    lens AS (
      SELECT user_id, agg, click, purch,
             least(len(agg),
                   coalesce(len(click), 9223372036854775807),
                   coalesce(len(purch), 9223372036854775807)) AS min_len
      FROM per_user WHERE agg IS NOT NULL
    ),
    wins AS (
      SELECT user_id, agg, click, purch,
             unnest(range(0, CASE WHEN min_len >= 8
                                  THEN (min_len - 8) // 4 + 1 ELSE 0 END)) AS w
      FROM lens
    )
    SELECT user_id, CAST(w AS BIGINT) AS window_id,
           to_json(list_transform(range(0, 8), i ->
             CAST(floor(CAST(agg[4 * w + i + 1] AS DOUBLE) * 1000000)
                  AS BIGINT))) AS x_u6_json,
           to_json(list_transform(range(0, 8), i ->
             [CAST(floor(CAST(coalesce(click[4 * w + i + 1], 0.0) AS DOUBLE)
                         * 1000000) AS BIGINT),
              CAST(floor(CAST(coalesce(purch[4 * w + i + 1], 0.0) AS DOUBLE)
                         * 1000000) AS BIGINT)])) AS y_u6_json,
           to_json(['click', 'purchase']) AS labels_json
    FROM wins
    """,
    survey_ref="§3 entry point 3 (channel_utils.py:144-248, ConvertToTensor.py:8-92)",
)
def tensor_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    # array-column export (the S10 sink shape). The scalar-flattened twin
    # below value-checks every RAW DOUBLE element of these windows against
    # DuckDB. The driver's canonicalizer sorts every column with pandas
    # sort_values(), which raises "unhashable type: 'list'" on array
    # columns (observed: CORRECTNESS_r03 err) — so the driver-facing row
    # shape serializes the tensors to JSON strings. Raw-double JSON text
    # diverges cross-engine (Spark Jackson prints 1.0E-4 / -0.0 where
    # DuckDB prints 0.0001 / 0.0), so the serialized payload carries the
    # repo-standard u6 exact integers (floor(v·1e6), embed_stats
    # convention) — integers print identically in both engines, making
    # this row hash-checkable. The raw array<double> form stays available
    # via operators.tensorize for the S10 sink itself.
    t = _tensorized(spark, sf_dir)
    u6 = "CAST(floor(CAST({v} AS DOUBLE) * 1000000) AS BIGINT)"
    return t.select(
        "user_id",
        "window_id",
        F.to_json(F.expr(f"transform(x, v -> {u6.format(v='v')})")).alias(
            "x_u6_json"
        ),
        F.to_json(
            F.expr(f"transform(y, r -> transform(r, v -> {u6.format(v='v')}))")
        ).alias("y_u6_json"),
        F.to_json("labels").alias("labels_json"),
    )


@query(
    "tensor_export_flat",
    oracle="""
    WITH series AS (
      SELECT user_id, event_type, list(value ORDER BY ts, event_id) AS v
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id, event_type
    ),
    per_user AS (
      SELECT user_id,
             any_value(v) FILTER (event_type = 'view') AS agg,
             any_value(v) FILTER (event_type = 'click') AS click,
             any_value(v) FILTER (event_type = 'purchase') AS purch
      FROM series GROUP BY user_id
    ),
    lens AS (
      SELECT user_id, agg, click, purch,
             least(len(agg),
                   coalesce(len(click), 9223372036854775807),
                   coalesce(len(purch), 9223372036854775807)) AS min_len
      FROM per_user WHERE agg IS NOT NULL
    ),
    wins AS (
      SELECT user_id, agg, click, purch,
             unnest(range(0, CASE WHEN min_len >= 8
                                  THEN (min_len - 8) // 4 + 1 ELSE 0 END)) AS w
      FROM lens
    ),
    flat AS (
      SELECT user_id, w, unnest(range(0, 8)) AS pos, agg, click, purch FROM wins
    )
    SELECT user_id, CAST(w AS BIGINT) AS window_id, CAST(pos AS INT) AS pos,
           agg[4 * w + pos + 1] AS x,
           coalesce(click[4 * w + pos + 1], 0.0) AS y_click,
           coalesce(purch[4 * w + pos + 1], 0.0) AS y_purchase
    FROM flat
    """,
    survey_ref="§2.5 W4 + §2.3 J6 element-exact check of the tensor export",
)
def tensor_export_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tensorized(spark, sf_dir)
    z = t.select(
        "user_id", "window_id", F.posexplode(F.arrays_zip("x", "y")).alias("pos", "z")
    )
    return z.select(
        "user_id",
        "window_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("z.x").alias("x"),
        F.element_at("z.y", 1).alias("y_click"),
        F.element_at("z.y", 2).alias("y_purchase"),
    )


# --- P8 suffix/unpivot classification ----------------------------------------------

@query(
    "unpivot_metrics",
    oracle="""
    WITH long AS (
      SELECT l_orderkey, 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'tax', l_tax FROM lineitem
    ),
    dim(metric, unit) AS (
      VALUES ('quantity', 'units'), ('extendedprice', 'usd'),
             ('discount', 'fraction'), ('tax', 'fraction')
    )
    SELECT d.unit, l.metric, count(*) AS n, round(sum(l.val), 2) AS total
    FROM long l JOIN dim d ON l.metric = d.metric
    GROUP BY ALL
    """,
    survey_ref="§2.2 P8 (OlaLoader.py:77-106 suffix→(type,unit) classification)",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stacked = li.select(
        "l_orderkey",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) as (metric, val)"
        ),
    )
    dim = spark.createDataFrame(
        [("quantity", "units"), ("extendedprice", "usd"),
         ("discount", "fraction"), ("tax", "fraction")],
        "metric string, unit string",
    )
    return (
        stacked.join(F.broadcast(dim), "metric")
        .groupBy("unit", "metric")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("val"), 2).alias("total"))
    )
