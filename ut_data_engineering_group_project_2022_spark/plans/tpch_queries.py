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


@register(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="Q4-shaped order-priority check: EXISTS correlated subquery as an "
    "explicit LEFT SEMI join (the SQL shape behind SURVEY J4/J7's "
    "NOT-EXISTS/IN patterns). Late shipment stands in for TPC-H's "
    "commitdate<receiptdate (those columns don't exist in this table).",
    tags=("tpch", "semi-join"),
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name, revenue FROM (
      SELECT c.c_custkey, c.c_name, n.n_name,
             ROUND(SUM({_DISC_PRICE_SQL}), 2)::DOUBLE AS revenue,
             ROW_NUMBER() OVER (ORDER BY SUM({_DISC_PRICE_SQL}) DESC,
                                c.c_custkey ASC) AS rn
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    ) t WHERE rn <= 20
    """,
    doc="Q10-shaped returned-item top-20 customers by lost revenue: "
    "selective fact scan (returnflag pushdown), broadcast dims, exact "
    "decimal revenue, deterministic custkey tiebreak.",
    tags=("tpch", "topk"),
    bench=True,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # Rank on the EXACT decimal sum (the oracle's ORDER BY) and round
        # only in the final projection: two customers whose exact sums
        # differ but round to the same cent must not swap ranks at the
        # top-20 boundary (round-1 advisory finding).
        .agg(F.sum(_disc_price()).alias("rev_exact"))
    )
    w = W.orderBy(F.desc("rev_exact"), F.asc("c_custkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("rev_exact", 2).cast("double").alias("revenue"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
             100.0 * ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                                    THEN {_DISC_PRICE_SQL}
                                    ELSE 0::DECIMAL(28,8) END), 2)::DOUBLE
                   / ROUND(SUM({_DISC_PRICE_SQL}), 2)::DOUBLE, 6)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="Q14-shaped promo revenue share: conditional decimal aggregate over "
    "one shipping month, broadcast part join, single-row percentage.",
    tags=("tpch", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.round(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
                F.lit(0).cast("decimal(28,8)")
            )
        ),
        2,
    ).cast("double")
    total = F.round(F.sum(_disc_price()), 2).cast("double")
    return j.agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_revenue_pct")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, sum_qty FROM (
      SELECT o.o_custkey AS c_custkey, l.l_orderkey AS o_orderkey,
             o.o_totalprice,
             (SUM(l.l_quantity::DECIMAL(18,4)))::DOUBLE AS sum_qty
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2, 3
      HAVING SUM(l.l_quantity::DECIMAL(18,4)) > 150
    ) t
    """,
    doc="Q18-shaped large-volume orders: fact-side groupBy with HAVING on "
    "an exact decimal sum — the aggregate-then-filter shape.",
    tags=("tpch", "agg"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    # No broadcast hint: orders is fact-sized, so forcing it into every
    # executor's memory would OOM a real cluster (round-1 advisory
    # finding). AQE picks the join strategy; both sides shuffle on the
    # shared key, which is the co-partitioned plan you want at 100 TB.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_orderkey").alias("o_orderkey"),
            "o_totalprice",
        )
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
    )
