"""JSONL (newline-delimited JSON) ingest with quarantine semantics.

The dominant interchange format for raw training-data corpora. Two
rules make it scale-safe:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over the data to infer one — at 100 TB
  that doubles the scan. Same stance as the CSV source (no
  ``inferSchema``, reference jobs/io_utils.py:69-85).
- **Malformed lines are rows, not failures.** One corrupt record among
  billions must not kill the job (FAILFAST) or silently vanish
  (DROPMALFORMED). PERMISSIVE mode routes each bad line's raw text
  into a quarantine column, so ingest always succeeds and the bad
  lines remain queryable/auditable — ``split_quarantine`` then
  separates clean rows from a quarantine frame the pipeline can sink
  for inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-first JSONL read; malformed lines land in ``corrupt_col``
    with every data column null (PERMISSIVE), so the scan is single-pass
    and total."""
    # StructType.add mutates the receiver — build a fresh struct so the
    # caller's schema object survives repeated reads
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_quarantine(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the quarantine column
    dropped, and the raw text of every malformed line.

    Spark rejects any query over a raw JSON source whose referenced
    columns reduce to only the corrupt column (SPARK-21610 — column
    pruning would otherwise skip parsing and nothing would be corrupt),
    so the parsed frame is cached here before splitting. That is the
    right shape at scale too: land the parsed frame once (cache for a
    small ingest, a parquet stage table for a 100 TB one — parquet
    scans carry no such restriction), then derive both branches from
    the landed copy instead of re-parsing the raw text twice."""
    df = df.cache()
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantine
