"""SQL-API catalog queries: raw ``spark.sql`` text over registered
views (sources/tables.py::register_views) — the second half of the
engine's user surface (DataFrame AND SQL, per the brief).

The coverage axis here is SUBQUERY DE-CORRELATION, which the
DataFrame-side catalog can't express directly: correlated EXISTS /
NOT EXISTS (Catalyst rewrites to left-semi / left-anti joins), IN
subqueries, and correlated scalar aggregate subqueries (rewritten to
an aggregate + left outer join).  The same SQL text runs on DuckDB as
the oracle, so the certified claim is "identical ANSI semantics on
both engines", not just matching results from hand-mirrored plans.

Numeric comparisons against aggregates use decimal-exact cross
multiplication (``price * n > sum`` instead of ``price > avg``):
fp averages drift by summation order, and a boundary row flipping
sides would flake the hash gate — exact decimal arithmetic can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rentals_data_pipeline_spark.plans.catalog import query
from rentals_data_pipeline_spark.sources.tables import register_views

_EXISTS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderstatus = 'F'
          AND o.o_orderpriority = '1-URGENT'
      )
"""


@query("sql_correlated_exists_customers", _EXISTS_SQL)
def sql_correlated_exists_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS through the SQL front end:
    customers with at least one urgent order where none of their
    urgent orders has already completed ('F').  Catalyst de-correlates both predicates into a left-semi
    and a left-anti hash join on c_custkey — the plan a hand-written
    DataFrame semi/anti pair would produce (and at this SF both
    demote to broadcast under AQE).  Identical SQL text is the
    oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(38,6))
      * (SELECT COUNT(*) FROM orders o2
         WHERE o2.o_custkey = o.o_custkey)
      > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(38,6)))
         FROM orders o3
         WHERE o3.o_custkey = o.o_custkey)
"""


@query("sql_above_customer_avg_orders", _ABOVE_AVG_SQL)
def sql_above_customer_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subqueries: orders strictly above
    their own customer's average price.  Catalyst de-correlates the
    two scalar subqueries into per-customer aggregates joined back to
    the fact (one shuffle keyed on o_custkey, shared by AQE).  The
    comparison is exact cross multiplication over decimals
    (price * n > sum) — NOT ``price > AVG(price)``, whose fp value
    depends on summation order and whose boundary rows would differ
    between engines."""
    register_views(spark, sf_dir)
    return spark.sql(_ABOVE_AVG_SQL)


_IN_SQL = """
SELECT n.n_name, COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_nationkey IN (
        SELECT s_nationkey FROM supplier
        GROUP BY s_nationkey
        HAVING SUM(CASE WHEN s_acctbal > 0 THEN 1 ELSE 0 END) >= 1
      )
GROUP BY n.n_name
"""


@query("sql_in_subquery_supplier_nations", _IN_SQL)
def sql_in_subquery_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery with its own aggregation + HAVING (nations with at
    least one positive-balance supplier), joined through the nation dim and re-aggregated:
    IN-to-semi-join rewrite + broadcast dim + final count.  The
    supplier-side aggregate is tiny (|nations| rows), so it broadcasts
    into the customer scan's stage at any scale."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
     LATERAL (
         SELECT o_orderkey, o_totalprice
         FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 3
     ) AS o
"""


@query("sql_lateral_topk_orders", _LATERAL_SQL)
def sql_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL front end: each
    customer's top-3 orders by price (deterministic tie-break).
    Catalyst de-correlates the per-row LATERAL limit into a windowed
    top-k over one join — executed per-partition, not per-customer.
    Identical SQL runs on DuckDB as the oracle, certifying LATERAL
    semantics including customers with < 3 orders (emit what exists)
    and with none (emit nothing)."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_CTE_WINDOW_SQL = """
WITH daily AS (
    SELECT
        CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        o_orderpriority,
        SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS revenue
    FROM orders
    GROUP BY 1, 2
),
ranked AS (
    SELECT day, o_orderpriority, revenue,
        RANK() OVER (
            PARTITION BY day ORDER BY revenue DESC, o_orderpriority
        ) AS rnk
    FROM daily
)
SELECT day, o_orderpriority,
    FLOOR(CAST(revenue AS DOUBLE) * 1e2 + 0.5) / 1e2 AS revenue,
    CAST(rnk AS INT) AS rnk
FROM ranked
WHERE rnk <= 3
"""


@query("sql_cte_window_topn", _CTE_WINDOW_SQL)
def sql_cte_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTEs + window functions through the SQL front end: daily revenue
    by order priority, top-3 priorities per day (the QUALIFY pattern,
    spelled as a ranked CTE + outer filter — portable to engines
    without QUALIFY). Catalyst pushes the rnk <= 3 filter into a
    WindowGroupLimit below the rank window, so each day retains only
    its top rows BEFORE the window shuffle completes — the windowed
    top-k plan the DataFrame catalog pins in test_plan_shapes, here
    certified through raw SQL text that runs verbatim on DuckDB.
    Revenue sums decimal-cast prices (exact, order-invariant), so rank
    boundaries cannot flip between engines; the final SELECT rounds the
    exact decimal to a 2-dp DOUBLE because the driver's pandas-side
    oracle fetch widens DuckDB decimals to float64 — emitting raw
    DECIMAL(38,6) stringifies '123.450000' vs '123.45' and fails the
    hash gate on equal values (round-5 red row)."""
    register_views(spark, sf_dir)
    return spark.sql(_CTE_WINDOW_SQL)


_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
    SELECT CAST('1995-01-01' AS DATE)
    UNION ALL
    SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
    WHERE m < CAST('2001-07-01' AS DATE)
),
mo AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        COUNT(*) AS n_orders,
        SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
    FROM orders GROUP BY 1
)
SELECT months.m,
    CAST(COALESCE(mo.n_orders, 0) AS BIGINT) AS n_orders,
    FLOOR(CAST(COALESCE(mo.rev, 0) AS DOUBLE) * 1e2 + 0.5) / 1e2
        AS revenue
FROM months LEFT JOIN mo ON mo.m = months.m
"""


@query("sql_recursive_month_spine", _RECURSIVE_SQL)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE through the SQL front end (new in Spark 4): a
    79-month calendar spine generated by the recursion itself (the
    UnionLoop fixpoint operator), left-joined to monthly order
    aggregates so absent months surface as zero rows — the
    recursive-SQL twin of `ts_gap_fill_hourly`'s sequence() spine.
    Spark's recursive CTEs support UNION ALL bodies (acyclic
    recursions like series/hierarchy generation; cyclic closure still
    wants the DataFrame-side pointer-jumping CC). The IDENTICAL text
    runs on DuckDB, certifying both engines execute the same
    recursion to the same fixpoint."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_PIVOT_SQL = """
SELECT * FROM (
    SELECT o_orderpriority, o_orderstatus FROM orders
)
PIVOT (
    COUNT(*) FOR o_orderstatus IN ('O' AS st_open, 'F' AS st_full,
                                   'P' AS st_partial)
)
"""

_PIVOT_ORACLE = """
SELECT o_orderpriority,
    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_open,
    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_full,
    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_partial
FROM orders
GROUP BY o_orderpriority
"""


@query("sql_pivot_status_by_priority", _PIVOT_ORACLE)
def sql_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT syntax through the front end: order counts cross-
    tabulated status x priority with explicit IN-list columns (the
    only scalable pivot — an open-ended pivot needs a values scan
    first; the DataFrame twin is `reshape_pivot_event_types`). Spark
    compiles PIVOT to the same single groupBy with pivot aggregates;
    the oracle states the portable CASE form (DuckDB's PIVOT dialect
    differs), certifying the syntax desugars to exactly that."""
    register_views(spark, sf_dir)
    return spark.sql(_PIVOT_SQL)


_SELECT_SCALAR_SQL = """
SELECT c_custkey, c_mktsegment,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderstatus = 'O') AS open_orders,
       (SELECT MAX(o_totalprice) FROM orders o
        WHERE o.o_custkey = c.c_custkey) AS max_order
FROM customer c
"""


@query("sql_select_list_scalar_subqueries", _SELECT_SCALAR_SQL)
def sql_select_list_scalar_subqueries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — the remaining
    de-correlation shape after WHERE-clause EXISTS/IN/scalar: Catalyst
    rewrites each into an aggregate + left outer join on the
    correlation key (customers without open orders get COUNT 0 /
    MAX NULL, exactly as the per-row subquery semantics demand — the
    rewrite must preserve empty-group behavior, which is the classic
    de-correlation bug). Identical SQL text runs on DuckDB; outputs
    are an exact integer count and a MAX over 2-dp doubles, so no
    rounding is involved anywhere."""
    register_views(spark, sf_dir)
    return spark.sql(_SELECT_SCALAR_SQL)
