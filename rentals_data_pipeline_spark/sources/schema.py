"""Dynamic explicit-schema construction (never ``inferSchema``).

Capability parity with the reference's two-pass pattern (reference:
jobs/io_utils.py:21-53): discover column names cheaply, then build an
explicit ``StructType`` from (a) a fixed name→type map, (b) a value-type
for pattern-matched columns (the reference's ``^\\d{4}-\\d{2}(-\\d{2})?$``
date columns → Double), (c) a string fallback. Explicit schemas avoid
``inferSchema``'s full extra data scan — at 100 TB that scan is the
difference between one pass and two.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

DATE_COL_PATTERN = re.compile(r"^\d{4}-\d{2}(-\d{2})?$")


def date_like_columns(columns: list[str]) -> list[str]:
    """Columns whose *names* look like dates (wide-format month cols)."""
    return [c for c in columns if DATE_COL_PATTERN.match(c)]


def build_schema(
    columns: list[str],
    fixed_fields: dict[str, T.DataType] | None = None,
    pattern: re.Pattern[str] = DATE_COL_PATTERN,
    pattern_type: T.DataType = T.DoubleType(),
    default_type: T.DataType = T.StringType(),
) -> T.StructType:
    """Explicit StructType: fixed map / regex-matched / string fallback.

    All fields nullable (raw zone data is never trusted to be complete).
    """
    fixed = fixed_fields or {}
    fields = []
    for name in columns:
        if name in fixed:
            dtype = fixed[name]
        elif pattern.match(name):
            dtype = pattern_type
        else:
            dtype = default_type
        fields.append(T.StructField(name, dtype, nullable=True))
    return T.StructType(fields)
