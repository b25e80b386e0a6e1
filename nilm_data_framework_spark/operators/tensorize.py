"""Windowed tensor export — the reference's tensorization pipeline
(channel_utils.py:144-248 prepare_nilm_tensors, ConvertToTensor.py:8-92):
per house, align appliance series into globally-sorted label slots (J6,
missing label → zeros), truncate to the shortest series (W7), then cut
fixed-length overlapping windows (W4) over the aggregate (x) and the label
matrix (y).

Spark shape: one ``applyInPandas`` per (dataset, house) group — a single
shuffle on the group key; all window cutting is NumPy stride tricks inside
the group. Output rows ``(house, window_id, x array<double>,
y array<array<double>>, labels array<string>)`` land in Parquet (S10)
instead of torch .pt files; the ML boundary reads them with one
``mapInPandas``/``toPandas``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def tensorize(
    readings: DataFrame,
    house: str,
    label: str,
    ts: str | list[str],
    value: str,
    aggregate_label: str,
    target_labels: list[str],
    seq_len: int,
    step: int,
) -> DataFrame:
    """One row per (house, window): x = aggregate windows, y = per-target-label
    windows stacked in sorted(target_labels) order, zero column for labels a
    house lacks (ConvertToTensor.py:79-84).

    Series are aligned positionally after per-label time sort and truncated
    to the shortest available series (channel_utils.py:213-220); windows
    start at 0, step, 2·step … and only complete windows are kept
    (ConvertToTensor.py:60).
    """
    labels_sorted = sorted(target_labels)
    # list ts = deterministic tie-breaks (shuffle arrival order must never
    # leak into the window values)
    order_cols = [ts] if isinstance(ts, str) else list(ts)

    house_field = readings.schema[house]
    out_schema = StructType(
        [
            StructField(house, house_field.dataType),
            StructField("window_id", LongType()),
            StructField("x", ArrayType(DoubleType())),
            StructField("y", ArrayType(ArrayType(DoubleType()))),
            StructField("labels", ArrayType(StringType())),
        ]
    )

    def per_house(pdf: pd.DataFrame) -> pd.DataFrame:
        series: dict[str, np.ndarray] = {}
        for lab, grp in pdf.groupby(label):
            series[lab] = grp.sort_values(order_cols, kind="mergesort")[value].to_numpy(
                np.float64
            )
        if aggregate_label not in series:
            return pd.DataFrame(columns=[house, "window_id", "x", "y", "labels"])
        present = [series[lab] for lab in labels_sorted if lab in series]
        min_len = min([len(series[aggregate_label])] + [len(s) for s in present])
        x_all = series[aggregate_label][:min_len]
        y_all = np.stack(
            [
                series[lab][:min_len] if lab in series else np.zeros(min_len)
                for lab in labels_sorted
            ],
            axis=1,
        )  # [min_len, Z]
        n = (min_len - seq_len) // step + 1 if min_len >= seq_len else 0
        if n <= 0:
            return pd.DataFrame(columns=[house, "window_id", "x", "y", "labels"])
        idx = np.arange(n)[:, None] * step + np.arange(seq_len)[None, :]
        xs = x_all[idx]  # [n, seq_len]
        ys = y_all[idx]  # [n, seq_len, Z]
        return pd.DataFrame(
            {
                house: [pdf[house].iloc[0]] * n,
                "window_id": np.arange(n, dtype=np.int64),
                # ndarray.tolist() converts the whole block in C — a nested
                # Python comprehension here was the measured hotspot (~2x on
                # the full tensor-export bench query)
                "x": xs.tolist(),
                "y": ys.tolist(),
                "labels": [labels_sorted] * n,
            }
        )

    from nilm_data_framework_spark.operators.parallelism import pin_group_parallelism

    # Ship ONLY what per_house reads across the JVM→Python boundary (guide
    # §4.1: Spark cannot see which columns/rows an opaque function touches).
    # Rows: per_house uses series for aggregate_label ∪ target_labels alone —
    # other labels are built then discarded (and a house with no
    # aggregate_label rows yields no output either way), so the label filter
    # is exact. Columns: the full readings schema (e.g. the events `props`
    # payload) would otherwise be shuffled AND Arrow-serialized per row.
    needed = sorted({aggregate_label, *target_labels})
    slim = readings.where(F.col(label).isin(needed)).select(
        house, label, *order_cols, value
    )

    # pin full-width parallelism for the Python stage (AQE byte-coalescing
    # would under-parallelize it — see operators/parallelism.py)
    return (
        pin_group_parallelism(slim, [house])
        .groupBy(house)
        .applyInPandas(per_house, schema=out_schema)
    )


def normalize_for_training(windows: DataFrame, q: float = 0.99) -> DataFrame:
    """train_bert_single.py:48-72 normalization: divide by the global
    q-quantile of x (exact percentile over window maxima), clamp to [0, 1].

    Fully lazy: the single-row quantile relation joins in via a broadcast
    cross join instead of a driver collect, so the operator composes into
    larger plans without forcing an action (and the quantile scan shares the
    stage graph / AQE context of the final job)."""
    qrow = windows.select(
        F.coalesce(
            F.nullif(F.expr(f"percentile(array_max(x), {q})"), F.lit(0.0)),
            F.lit(1.0),
        ).alias("_qmax")
    )
    clamp = lambda c, qm: F.least(F.greatest(c / qm, F.lit(0.0)), F.lit(1.0))  # noqa: E731
    return (
        windows.crossJoin(F.broadcast(qrow))
        .select(
            *windows.columns,
            F.transform("x", lambda c: clamp(c, F.col("_qmax"))).alias("x_norm"),
            F.transform(
                "y", lambda row: F.transform(row, lambda c: clamp(c, F.col("_qmax")))
            ).alias("y_norm"),
        )
    )
