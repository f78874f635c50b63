"""Local replica of the driver's correctness gate.

Runs every catalog query in Spark AND its DuckDB oracle on the same
parquet, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, floats rounded for stringification).
Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from rentals_data_pipeline_spark import TABLES  # noqa: E402
from rentals_data_pipeline_spark.session import create_spark_session  # noqa: E402


def norm_cell(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision: %.6g would mask last-digit drift in large sums
        # (e.g. revenue ~1e7 rounded to cents needs 9+ significant digits).
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Mirror the driver's gate: Spark 4 defaults to ANSI-on and the
    # driver does not opt out, so the engine's permissive session config
    # never applies there. Certifying under ANSI-on locally catches
    # out-of-bounds element_at / overflow casts before the driver does.
    spark = create_spark_session(
        "oracle-check",
        shuffle_partitions=8,
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only)")
            if not srows:
                failures.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        # Driver-typing lint: the driver fetches the oracle through pandas,
        # where DuckDB HUGEINT (e.g. SUM over integers wrapped in CASE)
        # becomes float64 — "0.0" vs Spark's "0" breaks its value hash even
        # though fetchall() agrees. Flag integral Spark columns that pandas
        # widens to float on the oracle side.
        # Any DecimalType in an oracle-paired Spark schema is an automatic
        # failure: Spark collects Decimal('123.450000') while the driver's
        # pandas fetch of the DuckDB oracle widens DECIMAL to float64
        # ('123.45') — equal values, different strings, hash-red (round-5
        # red row sql_cte_window_topn). 38-digit decimals additionally
        # LOSE precision through float64. Round to DOUBLE via
        # functions.rounding.round_half_up / sql_round, or stringify.
        for f in sdf.schema.fields:
            if f.dataType.simpleString().startswith("decimal"):
                problems.append(
                    f"driver-typing: Spark col {f.name!r} is "
                    f"{f.dataType.simpleString()} — the driver's pandas "
                    "oracle fetch widens decimals to float64; emit a "
                    "rounded DOUBLE or a string instead"
                )
        spark_integral = {
            f.name
            for f in sdf.schema.fields
            if f.dataType.simpleString() in ("int", "bigint", "smallint", "tinyint")
        }
        if spark_integral:
            odtypes = con.execute(oracles[name]).df().dtypes
            for cname, dt in odtypes.items():
                if cname in spark_integral and str(dt).startswith("float"):
                    problems.append(
                        f"driver-typing: oracle col {cname!r} is {dt} in pandas "
                        "but integral in Spark (CAST it AS BIGINT in the SQL)"
                    )
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a diff sample
                sset = {
                    "\x1f".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                }
                oset = {
                    "\x1f".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                }
                for s in list(sset - oset)[:3]:
                    print(f"        spark-only: {s!r}")
                for s in list(oset - sset)[:3]:
                    print(f"        duck-only : {s!r}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} failing: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
