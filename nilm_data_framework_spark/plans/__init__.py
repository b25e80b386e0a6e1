from nilm_data_framework_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    query,
    registry,
)
