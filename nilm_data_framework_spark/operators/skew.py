"""Skew mitigation for hot join/group keys (SCALE.md; SURVEY.md §4).

AQE's skew-join splitting handles moderate skew automatically (enabled in
session.py). For the pathological cases — one house/bucket holding a large
fraction of all rows — explicit salting bounds any single task:

- ``salted_join``: fact keys get a random salt in [0, n); the (small) right
  side is replicated n× with every salt value, so the join key becomes
  (key, salt) and the hot key spreads over n tasks. Semantics are identical
  to the unsalted equi-join.
- ``salted_groupby_sum``-style two-phase aggregation is NOT provided as an
  operator because Spark's partial aggregation already does exactly that
  (map-side combine per partition before the exchange); salting a groupBy
  only helps for holistic aggregates (e.g. exact percentile), where the
  documented path is percentile_approx (mergeable sketch) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an ``n_salts``-way salt on the join key.

    The fact side adds salt = pmod(hash(monotonic row id), n); the right side
    explodes to one copy per salt value. Use when one key dominates and AQE
    skew splitting is insufficient (e.g. right side too large to broadcast
    but small enough to replicate n×). Result equals ``fact.join(right, on,
    how)`` row-for-row for fact-preserving join types only: because the right
    side is replicated per salt, right/full outer joins would emit each
    unmatched right row ``n_salts`` times, so those types are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving join types {sorted(allowed)}, "
            f"got {how!r}: replicating the right side per salt would duplicate "
            "unmatched right rows under right/full outer semantics"
        )
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    right_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_salted.join(right_salted, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
