"""Universal label taxonomy + the J3 keyword→label mapping (SURVEY.md §2.3 J3).

The reference maps each channel's raw label to a universal label with three
ordered match tiers (UnifiedNILM/UnifiedNILM.py:40-64 against the keyword
dictionary at UnifiedNILM/UniversalLabels.py:15-78):

  tier 1 — exact equality of the cleaned raw label with a keyword
  tier 2 — keyword substring-contained in the cleaned raw label
  tier 3 — universal label name substring-contained in the cleaned raw label
  fallback — 'other'

Ties break by dictionary order (first label whose keyword matches wins).
Cleaning = lowercase, replace ``[_\\-,]`` with space, collapse whitespace.

We re-express the taxonomy as a *dimension table* and the mapping as a
broadcast join + priority pick — set-oriented, no per-row Python. A compact
representative taxonomy is authored here (the reference ships 61 labels; the
mapping ALGORITHM is what carries, and the dim is user-supplied data at
deploy time via ``keywords_df``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (universal_label, [keywords...]) in priority order — dict order in the
# reference is match-precedence order, so position IS priority.
UNIVERSAL_LABELS: list[tuple[str, list[str]]] = [
    ("aggregate", ["aggregate", "mains", "whole house", "site meter"]),
    ("fridge", ["fridge", "refrigerator", "fridge freezer"]),
    ("freezer", ["freezer", "chest freezer"]),
    ("washing machine", ["washing machine", "washer"]),
    ("dishwasher", ["dishwasher", "dish washer"]),
    ("tumble dryer", ["tumble dryer", "dryer"]),
    ("kettle", ["kettle"]),
    ("microwave", ["microwave"]),
    ("oven", ["oven", "electric oven"]),
    ("toaster", ["toaster"]),
    ("television", ["television", "tv"]),
    ("computer", ["computer", "pc", "desktop"]),
    ("laptop", ["laptop"]),
    ("lighting", ["light", "lighting", "lamp"]),
    ("electric heater", ["heater", "space heater"]),
    ("boiler", ["boiler"]),
    ("electric vehicle", ["ev charger", "car charger", "electric vehicle"]),
    ("solar", ["solar", "pv"]),
    ("battery", ["battery", "storage"]),
    ("pump", ["pump"]),
    ("other", []),
]


def clean_label(col: F.Column) -> F.Column:
    """F1: lower, ``[_\\-,]``→space, collapse whitespace, trim
    (UnifiedNILM.py:41-42)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[_\-,]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def keywords_df(spark) -> DataFrame:
    """The taxonomy as an exploded dimension: (universal_label, keyword,
    tier, priority). tier 3 rows carry the label name itself as keyword."""
    rows = []
    for li, (label, kws) in enumerate(UNIVERSAL_LABELS):
        for ki, kw in enumerate(kws):
            rows.append((label, kw, 1, li * 1000 + ki))  # tier1: exact
            rows.append((label, kw, 2, li * 1000 + ki))  # tier2: contains kw
        if label != "other":
            rows.append((label, label, 3, li * 1000 + 999))  # tier3: contains label name
    return spark.createDataFrame(rows, "universal_label string, keyword string, tier int, priority int")


def map_universal_label(
    labels: DataFrame,
    keywords: DataFrame,
    raw_col: str = "raw_label",
    out: str = "universal_label",
) -> DataFrame:
    """J3 as a broadcast theta-join + ordered pick.

    Join condition per tier: tier1 ``cleaned == kw``; tier2/3
    ``contains(cleaned, kw)``. Winner = min (tier, priority) — exactly the
    reference's ordered-tier, dict-order precedence. Unmatched → 'other'.

    The keyword dim is tiny → broadcast; the contains-join is a broadcast
    nested loop (fine: |dim| ~ hundreds). For exact-parity testing there is
    a pandas_udf twin in tests/test_kernels.py.
    """
    cleaned = labels.withColumn("_cleaned", clean_label(F.col(raw_col)))
    kw = keywords
    cond = (
        (kw["tier"] == 1) & (cleaned["_cleaned"] == kw["keyword"])
    ) | ((kw["tier"].isin(2, 3)) & (cleaned["_cleaned"].contains(kw["keyword"])))
    joined = cleaned.join(F.broadcast(kw), cond, "left")
    w = Window.partitionBy(*[cleaned[c] for c in labels.columns]).orderBy(
        kw["tier"].asc_nulls_last(), kw["priority"].asc_nulls_last()
    )
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .withColumn(out, F.coalesce(kw["universal_label"], F.lit("other")))
        .select(*labels.columns, out)
    )
