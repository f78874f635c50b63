"""XML ingest/egress on Spark 4's built-in XML data source.

Round 6 adds the last text interchange format the engine was missing
(CSV, JSONL, ORC, parquet, binary already covered). Same two rules as
the JSONL source (sources/jsonl.py), because they are what make ingest
scale-safe:

- **Explicit schema, never inference.** ``rowTag`` framing plus a
  declared ``StructType``; schema inference over XML costs a full
  extra pass and guesses types (reference stance: no ``inferSchema``,
  jobs/io_utils.py:69-85).
- **Malformed records are rows, not failures.** PERMISSIVE mode routes
  each unparseable record's raw text into a quarantine column —
  ``split_quarantine`` (shared with the JSONL source) separates clean
  rows from an auditable quarantine frame.

At 100 TB: the XML reader splits uncompressed (and bzip2) files at
``rowTag`` boundaries, so a large dump parallelizes like any text
source; a gzip member is one task — re-chunk monolithic .xml.gz dumps
(e.g. wiki exports) before ingest. Attributes surface with the ``_``
prefix (``attributePrefix`` default); element text under
``valueTag``. For XML embedded in a column of an already-loaded table
(the common training-corpus case: one document per row, body is an
XML string), ``parse_xml_strings`` runs ``from_xml`` as a codegen
expression — no re-scan, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rentals_data_pipeline_spark.sources.jsonl import (
    CORRUPT_COL,
    split_quarantine,
)

__all__ = ["read_xml", "write_xml", "parse_xml_strings", "split_quarantine"]


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-first XML read framed on ``row_tag``; records that fail
    to parse land in ``corrupt_col`` with every data column null
    (PERMISSIVE), so the scan is single-pass and total. Pair with
    ``split_quarantine`` for the (clean, quarantine) split."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .format("xml")
        .load(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Distributed XML sink: one well-formed document per task output
    file (``root_tag`` wrapping ``row_tag`` elements) — no
    ``coalesce(1)``, same no-single-writer stance as sources/sink.py."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def parse_xml_strings(
    col: str | Column, schema: T.StructType | str
) -> Column:
    """Parse an XML-string column with ``from_xml`` — a codegen
    expression over rows already in the scan, the right shape when XML
    bodies arrive as a column of a 100 TB table rather than as .xml
    files (unparseable strings yield a null struct, never a task
    failure)."""
    return F.from_xml(col, schema)
