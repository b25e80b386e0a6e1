"""Source connectors: raw NILM formats, canonical Parquet, driver testdata."""

from nilm_data_framework_spark.sources.testdata import load_table, load_tables  # noqa: F401
