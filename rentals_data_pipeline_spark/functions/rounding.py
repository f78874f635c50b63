"""Cross-engine deterministic rounding.

Spark's ``round()`` converts the double to its shortest decimal string
then applies HALF_UP (a value infinitesimally below a midpoint, e.g.
38.37874999…, prints as "38.37875" and rounds UP); DuckDB rounds the
binary double (DOWN in that case). Any avg/division-derived value can
land on such a boundary, so engine-vs-oracle hash comparison breaks
nondeterministically.

Fix: round via explicit IEEE arithmetic — ``floor(x * 10^p + 0.5) /
10^p`` — the same ops in both engines produce bit-identical doubles.
Use this (and ``sql_round`` on the oracle side) for every float the
catalog emits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, scale: int = 2) -> Column:
    """floor(x·10^p + 0.5)/10^p — deterministic across engines."""
    s = float(10**scale)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_round(expr: str, scale: int = 2) -> str:
    """The identical formula as ANSI SQL text for the DuckDB oracle."""
    s = float(10**scale)
    return f"FLOOR(({expr}) * {s} + 0.5) / {s}"
