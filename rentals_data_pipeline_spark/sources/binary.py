"""Binary-file ingest: raw media files -> the opaque-binary data model.

The front door of the multimodal pipeline (operators/multimodal.py):
``spark.read.format("binaryFile")`` lists a directory tree and emits
one row per file — (path, modificationTime, length, content binary) —
so image/audio/video corpora enter the engine as the same
opaque-bytes-plus-metadata rows the decode/feature kernels consume,
without any driver-side file iteration.

Scale rules baked in:

- **Predicate pushdown on file size.** ``pathGlobFilter`` and
  ``spark.sql.files.maxPartitionBytes`` govern listing/split work;
  the ``max_bytes`` guard pushes ``length <= N`` into the reader
  (binaryFile supports length-filter pushdown), so oversized blobs
  are skipped at LISTING time, not after materializing their content.
- **No whole-directory collect.** Listing is distributed; each task
  reads only its files' bytes.
- **Stable ids.** ``doc_id`` is the 64-bit xxhash of the file path —
  deterministic across runs and partitionings, so downstream dedup /
  join keys do not depend on listing order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """One row per file under ``path``: (doc_id, path, length, media).

    ``glob`` filters file names at listing time (e.g. ``*.wav``);
    ``max_bytes`` pushes a length cap into the scan so oversized files
    never reach an executor's memory.
    """
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("path"),
        F.col("length"),
        F.col("content").alias("media"),
    )
