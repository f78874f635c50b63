"""Sources & sinks: typed CSV ingest, parquet read/write, test tables."""

from rentals_data_pipeline_spark.sources.schema import build_schema, date_like_columns
from rentals_data_pipeline_spark.sources.csv import read_csv_typed
from rentals_data_pipeline_spark.sources.sink import write_partitioned_parquet
from rentals_data_pipeline_spark.sources.tables import load_table, load_tables, register_views

__all__ = [
    "build_schema",
    "date_like_columns",
    "read_csv_typed",
    "write_partitioned_parquet",
    "load_table",
    "load_tables",
    "register_views",
]
