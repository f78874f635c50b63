"""Scalar helper functions shared across operators and the catalog."""

from rentals_data_pipeline_spark.functions.rounding import round_half_up, sql_round

__all__ = ["round_half_up", "sql_round"]
