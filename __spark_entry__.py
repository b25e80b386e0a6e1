"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (A2 aggregate-from-appliances, the
reference's compute_aggregate_from_appliances at UnifiedNILM.py:438-490) on
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 via the registry in
nilm_data_framework_spark/plans/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nilm_data_framework_spark.plans.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["aggregate_from_appliances"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; rows-only ops omitted."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
