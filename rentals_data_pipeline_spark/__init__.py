"""rentals_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference rentals-data-pipeline (schema-enforced ingest, wide→long
unpivot, cleaning, dedup, window analytics, partitioned parquet sink,
declarative data-quality checks, pipeline composition), generalized into
a reusable operator library and extended with large-scale training-data
operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding), similarity search, multimodal column plumbing, and text
analysis.

Design stance (Spark-first):
- Every operator is a pure ``DataFrame -> DataFrame`` function composed
  with ``df.transform`` (reference: jobs/transform.py:174-181).
- Declarative plans only — built-in ``pyspark.sql.functions``; Catalyst
  and AQE pick the physical strategy. Pandas UDFs appear only where the
  built-ins genuinely can't express the semantics (multimodal decode).
- Designed for 100 TB: no ``coalesce(1)``, broadcast for small dims,
  single-pass data-quality aggregation, AQE-friendly partitioning.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
