"""TPC-H-shaped headline queries on the driver's star schema.

These are the bench workhorses: classic scan-heavy aggregation (Q1),
selective multi-join top-k (Q3-like), region-local join chain (Q5-like),
and a pure scan-filter-aggregate (Q6). All money math is exact decimal
end-to-end so Spark and the DuckDB oracle agree bit-for-bit (registry.py).

Scale notes: Q1/Q6 are single-scan map-side-partial aggregations (no
pre-shuffle besides the final tiny groupBy); Q3/Q5 broadcast every dim
side so the only fact shuffle is the final aggregate's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.catalog import table
from ut_data_engineering_group_project_2022_spark.plans.registry import register


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(18,4)")


def _disc_price() -> F.Column:
    # disc_price = extendedprice * (1 - discount), exact decimal (38,8) -> (28,8)
    return (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).cast(
        "decimal(28,8)"
    )


def _charge() -> F.Column:
    # charge = disc_price * (1 + tax); (28,8) x (9,4) stays exact in both engines
    return _disc_price() * (_one() + _dec("l_tax")).cast("decimal(9,4)")

_DISC_PRICE_SQL = (
    "(l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))"
    "::DECIMAL(28,8)"
)
_CHARGE_SQL = (
    f"({_DISC_PRICE_SQL} * "
    "((1::DECIMAL(18,4) + l_tax::DECIMAL(18,4))::DECIMAL(9,4)))"
)


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           (SUM(l_quantity::DECIMAL(18,4)))::DOUBLE AS sum_qty,
           (SUM(l_extendedprice::DECIMAL(18,4)))::DOUBLE AS sum_base_price,
           ROUND(SUM({_DISC_PRICE_SQL}), 2)::DOUBLE AS sum_disc_price,
           ROUND(SUM({_CHARGE_SQL}), 2)::DOUBLE AS sum_charge,
           (SUM(l_quantity::DECIMAL(18,4)))::DOUBLE / COUNT(*) AS avg_qty,
           (SUM(l_extendedprice::DECIMAL(18,4)))::DOUBLE / COUNT(*) AS avg_price,
           (SUM(l_discount::DECIMAL(18,4)))::DOUBLE / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: single-scan grouped aggregation, "
    "map-side partials + tiny final shuffle.",
    tags=("tpch", "agg"),
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge()), 2).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(SUM({_DISC_PRICE_SQL}), 2)::DOUBLE AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 analog: selective star join + top-10 by revenue "
    "(deterministic tiebreak on orderkey).",
    tags=("tpch", "join", "topk"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, ROUND(SUM({_DISC_PRICE_SQL}), 2)::DOUBLE AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    doc="TPC-H Q5 analog: 6-way join chain, local-supplier constraint, "
    "all dims broadcast.",
    tags=("tpch", "join"),
    bench=True,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice::DECIMAL(18,4) * l_discount::DECIMAL(18,4)), 2)::DOUBLE
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-aggregate; predicates push to parquet.",
    tags=("tpch", "scan"),
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
        .cast("double")
        .alias("revenue")
    )
