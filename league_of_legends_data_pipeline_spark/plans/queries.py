"""Declared query set: every operator class from SURVEY.md §2 expressed over
the driver-generated tables, as a (PySpark DataFrame plan, DuckDB oracle SQL)
pair. The driver hash-compares both at sf=0.01 (CORRECTNESS gate).

Conventions
-----------
- Every computed column is aliased IDENTICALLY in the Spark plan and the SQL.
- Float aggregates are rounded (money → 2dp, ratios/scores → 6dp) so the two
  engines' summation orders cannot produce last-ulp mismatches.
- Every ORDER BY used under a LIMIT carries a total-order tiebreak.
- Plans are declarative DataFrame ops (Catalyst handles pushdown, pruning,
  join strategy); explicit `broadcast()` only where a dimension is known-small
  at any scale (region/nation-sized), mirroring SURVEY §2.5 J1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.session import load_tables


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: Optional[str], doc: str = ""):
    def wrap(fn):
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn
    return wrap


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


# ---------------------------------------------------------------------------
# A. Aggregations (SURVEY §2.6) -- pricing summary is the flagship
# ---------------------------------------------------------------------------

@_register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE)      AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(avg(l_quantity), 6) AS DOUBLE)      AS avg_qty,
           CAST(round(avg(l_discount), 6) AS DOUBLE)      AS avg_disc,
           count(*)                                       AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style grouped aggregation (SURVEY A2/A3); partial agg map-side.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "q02_group_count",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Queue-type distribution analogue (SURVEY A3, dsa.ipynb cell 5).",
)
def q02_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("event_type")
    )


@_register(
    "q03_distinct",
    """
    SELECT count(*) AS n_pairs FROM (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    """,
    doc="Dedup-by-distinct (SURVEY A1: set(matchesList) before fetch).",
)
def q03_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.select("l_orderkey", "l_suppkey").distinct()
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# J. Joins (SURVEY §2.5)
# ---------------------------------------------------------------------------

@_register(
    "q04_broadcast_join_topk",
    """
    SELECT p_brand,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 10
    """,
    doc="Broadcast hash join (SURVEY J1): small dim broadcast, big fact streamed.",
)
def q04_broadcast_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "p_brand")
        .limit(10)
    )


@_register(
    "q05_dim_snowflake_join",
    """
    SELECT r_name AS region, n_name AS nation,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue,
           count(DISTINCT o.o_custkey) AS n_customers
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name, n_name
    ORDER BY region, nation
    """,
    doc="Deferred dimension join (SURVEY J2): fact→dim snowflake, dims broadcast.",
)
def q05_dim_snowflake_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer, nation, region = _t(spark, sf_dir, "orders", "customer", "nation", "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("region", "nation")
    )


@_register(
    "q06_anti_join",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Set remainder as anti-join (SURVEY J4/U3: leftover matchlist).",
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@_register(
    "q07_semi_join",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    ORDER BY s_suppkey
    """,
    doc="Existence filter as left-semi join (processed-work membership check).",
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier, lineitem = _t(spark, sf_dir, "supplier", "lineitem")
    big = lineitem.filter(F.col("l_quantity") > 45)
    return (
        supplier.join(big, supplier.s_suppkey == big.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# U. Set operations (SURVEY §2.9)
# ---------------------------------------------------------------------------

@_register(
    "q08_union_parties",
    """
    SELECT party_id, name, nationkey, CAST(round(acctbal, 2) AS DOUBLE) AS acctbal, kind
    FROM (
        SELECT c_custkey AS party_id, c_name AS name, c_nationkey AS nationkey,
               c_acctbal AS acctbal, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal, 'supplier' FROM supplier
    )
    ORDER BY kind, party_id
    """,
    doc="Union of differently-shaped entity sets (SURVEY U1: high/low elo union).",
)
def q08_union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    cust = customer.select(
        F.col("c_custkey").alias("party_id"), F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"), F.lit("customer").alias("kind"),
    )
    supp = supplier.select(
        F.col("s_suppkey").alias("party_id"), F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"), F.lit("supplier").alias("kind"),
    )
    return (
        cust.unionByName(supp)
        .withColumn("acctbal", F.round("acctbal", 2))
        .select("party_id", "name", "nationkey", "acctbal", "kind")
        .orderBy("kind", "party_id")
    )


@_register(
    "q09_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="Intersect (SURVEY U4).",
)
def q09_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# W/L. Windows, ordered limits (SURVEY §2.7, §2.8)
# ---------------------------------------------------------------------------

@_register(
    "q10_latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate,
           CAST(round(o_totalprice, 2) AS DOUBLE) AS latest_totalprice
    FROM (
        SELECT o.*, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders o
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
    doc="row_number window top-1 per key (SURVEY §2.7: per-player latest frame).",
)
def q10_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.round("o_totalprice", 2).alias("latest_totalprice"),
        )
        .orderBy("o_custkey")
    )


@_register(
    "q11_running_totals",
    """
    SELECT event_id, user_id,
           CAST(round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS DOUBLE) AS running_value,
           CAST(round(value - lag(value, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 6) AS DOUBLE) AS delta_prev
    FROM events
    ORDER BY user_id, event_id
    """,
    doc="Running sum + lag deltas (gold-diff per frame analogue, SURVEY §2.7).",
)
def q11_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_id", "user_id",
            F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 6).alias("running_value"),
            F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("delta_prev"),
        )
        .orderBy("user_id", "event_id")
    )


@_register(
    "q12_ordered_limit",
    """
    SELECT c_custkey, c_name, CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10
    """,
    doc="Explicit ordered limit (SURVEY L1/L3: elo-priority player cap).",
)
def q12_ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .limit(10)
    )
