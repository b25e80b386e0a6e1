"""NumPy-oracle parity for the tensorization pipeline (reference
channel_utils.py:144-248 semantics: label alignment, zero-fill for missing
labels, truncate-to-min, stride windows)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from nilm_data_framework_spark.operators.tensorize import normalize_for_training, tensorize
from tests.conftest import SF_DIR


def _df(spark):
    rows = []
    # house 1: aggregate 20 pts, click 18 pts, purchase missing
    for i in range(20):
        rows.append((1, "agg", i, float(100 + i)))
    for i in range(18):
        rows.append((1, "click", i, float(i)))
    # house 2: lacks the aggregate label entirely → excluded
    for i in range(20):
        rows.append((2, "click", i, float(i)))
    pdf = pd.DataFrame(rows, columns=["house", "label", "pos", "power"])
    return spark.createDataFrame(pdf)


def test_tensorize_alignment_truncation_windows(spark):
    out = tensorize(
        _df(spark),
        house="house",
        label="label",
        ts="pos",
        value="power",
        aggregate_label="agg",
        target_labels=["click", "purchase"],
        seq_len=8,
        step=4,
    ).collect()
    assert {r["house"] for r in out} == {1}  # house 2 has no aggregate
    # min_len = min(len agg=20, len click=18) = 18 → windows: (18-8)//4+1 = 3
    assert sorted(r["window_id"] for r in out) == [0, 1, 2]
    by_id = {r["window_id"]: r for r in out}
    # x = aggregate values, truncated to 18, window 1 starts at pos 4
    assert by_id[1]["x"] == [float(100 + i) for i in range(4, 12)]
    # y columns sorted(target_labels) = [click, purchase]; purchase all-zero
    y1 = np.array(by_id[1]["y"])
    assert y1.shape == (8, 2)
    assert list(y1[:, 0]) == [float(i) for i in range(4, 12)]
    assert not y1[:, 1].any()
    assert by_id[0]["labels"] == ["click", "purchase"]


def test_tensorize_window_count_formula(spark):
    # reference formula (ConvertToTensor.py:60): n = (len - seq_len)//step + 1
    for seq_len, step, expected in [(8, 4, 3), (18, 1, 1), (19, 1, 0)]:
        out = tensorize(
            _df(spark), "house", "label", "pos", "power", "agg",
            ["click"], seq_len, step,
        ).filter(F.col("house") == 1)
        assert out.count() == expected, (seq_len, step)


def test_normalize_clamps_to_unit_interval(spark):
    wins = tensorize(
        _df(spark), "house", "label", "pos", "power", "agg", ["click"], 8, 4
    )
    norm = normalize_for_training(wins, q=0.99)
    rows = norm.collect()
    for r in rows:
        assert all(0.0 <= v <= 1.0 for v in r["x_norm"])
        assert all(0.0 <= v <= 1.0 for row in r["y_norm"] for v in row)


def test_grouped_windows_query_matches_sql_variant(spark):
    """The applyInPandas scale path and the declarative rowsBetween variant
    are the same operator semantically — their driver queries must agree."""
    from nilm_data_framework_spark.plans.registry import all_queries

    specs = all_queries()
    a = specs["sliding_windows"].spark(spark, SF_DIR).toPandas()
    b = specs["sliding_windows_grouped"].spark(spark, SF_DIR).toPandas()
    cols = sorted(a.columns)
    ta = sorted(map(tuple, a[cols].itertuples(index=False)))
    tb = sorted(map(tuple, b[cols].itertuples(index=False)))
    assert ta == tb


def test_tensor_parquet_roundtrip(spark, tmp_path):
    """S10: the windowed export persists to Parquet with array columns and
    reads back value-identical (the reference's torch.save analog)."""
    import pandas as pd

    rows = []
    for lab in ("agg", "x"):
        for t in range(12):
            rows.append((1, lab, t, float(t)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["h", "lab", "t", "v"]))
    wins = tensorize(
        df, house="h", label="lab", ts="t", value="v",
        aggregate_label="agg", target_labels=["x"], seq_len=4, step=2,
    )
    out = str(tmp_path / "tensors")
    wins.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema == wins.schema
    a = sorted(wins.collect(), key=lambda r: (r["h"], r["window_id"]))
    b = sorted(back.collect(), key=lambda r: (r["h"], r["window_id"]))
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
