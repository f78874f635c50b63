"""Canonical TPC-H query adaptations (Q3, Q5, Q10, Q18) over the star
schema — the industry-standard multi-join analytics shapes, expressed
in the DataFrame API and certified against the classic SQL text on
DuckDB. (Q1 already lives in the catalog as ``agg_pricing_summary``.)

Adaptations to this corpus's schema: no ``o_shippriority`` /
``c_address`` / ``c_phone`` / ``c_comment`` columns exist, so those
output columns are dropped; date windows sit inside the generated
1995–2001 range.

Determinism: revenue terms multiply NARROW decimal casts
(``DECIMAL(15,2) * (1.00 - DECIMAL(3,2))`` -> scale-4 products whose
widths stay legal on both engines), so every SUM is exact and
order-invariant; top-k ORDER BY runs on the EXACT decimal (ties broken
by key) and only the projected output rounds to a double — a rank
boundary can never flip between engines. At 100 TB: dimensions
broadcast (customer/nation/region/supplier), the only fact-sized
shuffle is lineitem-orders on the order key, and every date/segment
filter sits in the parquet scan (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.functions.rounding import round_half_up as RND
from rentals_data_pipeline_spark.plans.catalog import query
from rentals_data_pipeline_spark.sources.tables import load_table

# Exact per-row revenue term: l_extendedprice * (1 - l_discount) in
# decimal. Prices are 2-dp values stored as doubles; the narrow casts
# recover the exact decimal on both engines.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(15,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


_Q3_SQL = f"""
WITH r AS (
    SELECT l_orderkey, o_orderdate, SUM({_REV_SQL}) AS rev
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY 1, 2
),
top AS (
    SELECT * FROM r ORDER BY rev DESC, l_orderkey LIMIT 10
)
SELECT l_orderkey, o_orderdate,
    FLOOR(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0 AS revenue
FROM top
"""


@query("tpch_q3_unshipped_revenue", _Q3_SQL)
def tpch_q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, minus the absent o_shippriority):
    the 10 highest-revenue BUILDING-segment orders taken before
    1996-03-15 with lines still unshipped at that date. Plan: customer
    broadcasts into the orders scan, the filtered fact shuffles once on
    the order key, revenue aggregates map-side, and the top-10 is a
    TakeOrdered over the EXACT decimal revenue (orderkey tie-break) —
    ranking never touches a rounded double, so the cut line is
    bit-stable at any scale."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1996-03-15 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev_col()).alias("rev"))
    )
    return (
        r.orderBy(F.col("rev").desc(), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "o_orderdate",
            RND(F.col("rev").cast("double"), 2).alias("revenue"),
        )
    )


_Q5_SQL = f"""
SELECT n_name, FLOOR(CAST(SUM({_REV_SQL}) AS DOUBLE) * 100.0 + 0.5) / 100.0
    AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query("tpch_q5_local_supplier_volume", _Q5_SQL)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 1996 revenue per ASIA nation
    where the supplier and customer share the nation. Five dimension
    joins — supplier, customer, nation, region all broadcast (the
    region filter prunes nation before it ever reaches an executor
    join), so the only fact-sized exchange is lineitem-orders on the
    order key; the co-nationality predicate rides the supplier
    broadcast join. Exact decimal revenue, rounded once on output."""
    cutoff_lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(RND(F.sum(_rev_col()).cast("double"), 2).alias("revenue"))
    )


_Q10_SQL = f"""
WITH r AS (
    SELECT c_custkey, c_name, c_acctbal, n_name, SUM({_REV_SQL}) AS rev
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
),
top AS (
    SELECT * FROM r ORDER BY rev DESC, c_custkey LIMIT 20
)
SELECT c_custkey, c_name, c_acctbal, n_name,
    FLOOR(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0 AS revenue
FROM top
"""


@query("tpch_q10_returned_items", _Q10_SQL)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting, minus the absent
    address/phone/comment columns): the 20 customers who returned the
    most revenue in 1996-Q4. Customer and nation broadcast; the
    returnflag and date filters push into the two fact scans; top-20 is
    a TakeOrdered on the exact decimal (custkey tie-break), rounded
    only on output."""
    cutoff_lo = F.lit("1996-10-01 00:00:00").cast("timestamp")
    cutoff_hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_col()).alias("rev"))
    )
    return (
        r.orderBy(F.col("rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            RND(F.col("rev").cast("double"), 2).alias("revenue"),
        )
    )


_Q18_SQL = """
WITH heavy AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
    SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM heavy)
GROUP BY 1, 2, 3, 4, 5
"""


@query("tpch_q18_large_volume_customer", _Q18_SQL)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 300, with their customer and exact quantity sum. The heavy
    -order set is a self-aggregation of the fact (map-side combined)
    that semi-joins back — Catalyst turns the IN into a LeftSemi whose
    tiny build side broadcasts, so the fact is filtered BEFORE the
    customer join; quantities are integral doubles, so SUM is exact
    and the HAVING boundary cannot drift. Output left unordered (the
    gate hashes order-insensitively); the classic top-100 form would
    be one TakeOrdered more."""
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(heavy), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
