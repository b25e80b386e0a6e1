"""Query registry: the driver-facing contract.

Every implemented operator from SURVEY.md §2 registers a QuerySpec pairing a
Spark DataFrame builder with its DuckDB oracle SQL (or ``None`` for
non-SQL-expressible ops, which the driver checks rows-only). Keeping the pair
side-by-side in one decorator call is what keeps column names/semantics in
sync — the driver hash-compares values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    survey_ref: str = ""  # SURVEY.md §2 row(s) this query evidences
    tags: tuple[str, ...] = field(default_factory=tuple)


registry: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    survey_ref: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a (spark builder, oracle SQL) pair."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in registry:
            raise ValueError(f"duplicate query name {name!r}")
        registry[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, survey_ref=survey_ref, tags=tuple(tags)
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules and return the populated registry."""
    # Imports are deferred so `import nilm_data_framework_spark` stays cheap.
    from nilm_data_framework_spark.queries import (  # noqa: F401
        dedup_text,
        nilm_analysis,
        nilm_ingest,
        multimodal_assets,
        nilm_windows,
        relational,
        similarity,
        tensor_pipeline,
    )

    return dict(registry)
