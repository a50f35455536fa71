"""BI ranking queries — the reference's analyst surface re-expressed.

Every one of the reference's 15 BI queries (reference dags/sql/queries.sql:4-129)
has the same shape: star join (SURVEY J1/J2) + predicate (P8-P10) + window
aggregate (A1-A3) + DISTINCT collapse (D4) + global DENSE_RANK (W1).
These queries reproduce that exact shape — including the literal
DISTINCT-after-window form rather than a groupBy rewrite — on the driver's
star schema (fact = orders/lineitem; dims = customer/nation/region/part/
supplier).

Scale notes (100 TB):
  * Dim joins are broadcast (`F.broadcast`) — nation/region/customer are
    orders-of-magnitude smaller than the fact tables, so no shuffle on the
    fact side for the join; the only shuffle is the window partition.
  * The outer DENSE_RANK is global (single partition) *after* the DISTINCT
    collapse, so it ranks |group-keys| rows, not |fact| rows — same
    asymptotics as the reference (Postgres) version.

bi_rank drift verdict (r9 ask #4, closed r11): BENCH_r09 showed all four
benched bi_rank_* rows 1.2-1.5x slower than r8 with zero code change on
this module; BENCH_r10 — again with zero code change — showed the same
four rows back at 0.70-0.99x of r9 (bi_parts 0.70x, bi_suppliers 0.73x,
bi_revenue 0.87x). A regression that fully reverts without a diff is
host drift, not code: the bench host swings 1.5-3x minute-to-minute
(documented in bench.py since r8), and the r9 record was taken under a
sustained-loud probe (0.821 s vs the 0.645 s reference). Verdict: the
r9 bi_rank "regression" was host noise; no action on these plans, and
future bi_rank comparisons should be read against the same-record
noise probes (noise_probe_start/end in the payload as of r11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.catalog import (
    parquet_row_count as catalog_row_count,
    table,
)
from ut_data_engineering_group_project_2022_spark.operators import relational
from ut_data_engineering_group_project_2022_spark.operators.star import (
    global_dense_rank,
)
from ut_data_engineering_group_project_2022_spark.plans.registry import register

# Exact cross-engine revenue: decimal arithmetic end-to-end (see registry.py).
def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )


_REV_SQL = "(l_extendedprice::DECIMAL(18,4) * (1::DECIMAL(18,4) - l_discount::DECIMAL(18,4)))"


@register(
    "bi_rank_customers_by_order_count",
    oracle="""
    SELECT rc.c_custkey, rc.c_name, rc.n_orders,
           DENSE_RANK() OVER (ORDER BY rc.n_orders DESC) AS rnk
    FROM (
      SELECT DISTINCT c.c_custkey, c.c_name,
             COUNT(o.o_orderkey) OVER (PARTITION BY c.c_custkey) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) rc
    """,
    doc="Rank customers by order count (ref queries.sql:4-16 shape: J1+A1+D4+W1).",
    tags=("bi", "window", "dense_rank", "join"),
    bench=True,
)
def bi_rank_customers_by_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    # The ref's windowed-COUNT + DISTINCT collapses to exactly one row per
    # (c_custkey, c_name) — a partial-aggregating groupBy produces identical
    # values with map-side combine and a rank input of one row per group
    # (the r5 two-phase-rank regression fix: the first checkpoint inside
    # global_dense_rank now materializes |customers| rows, not a window).
    # Size-dispatched (r20, the bi-suppliers recipe): below the gate the
    # grouped COUNT and the dense rank run as ONE mapInArrow task over
    # the broadcast-join output (count needs no magnitude proof). The
    # distributed groupBy + two-phase rank above is byte-unchanged.
    n_o = catalog_row_count(sf_dir, "orders")
    if (
        relational.LOCAL_TPCH_ROWS
        and n_o is not None
        and n_o <= relational.LOCAL_TPCH_ROWS
    ):
        return relational.grouped_measure_rank_local(
            joined.select("c_custkey", "c_name", "o_orderkey"),
            "c_custkey",
            "c_name",
            "count_nonnull",
            ("o_orderkey",),
            "n_orders",
        )
    counted = joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders")
    )
    # Customer-grain rank: two-phase (range-partition + offsets), NOT a
    # global window — W1 parity at fact grain without the single-partition
    # WindowExec (the rounds-3/4 100x finding).
    return global_dense_rank(counted, "n_orders").select(
        "c_custkey", "c_name", "n_orders", "rnk"
    )


@register(
    "bi_rank_customers_by_revenue",
    oracle="""
    SELECT rc.c_custkey, rc.c_name, rc.revenue,
           DENSE_RANK() OVER (ORDER BY rc.revenue DESC) AS rnk
    FROM (
      SELECT DISTINCT c.c_custkey, c.c_name,
             (SUM(o.o_totalprice::DECIMAL(18,4)) OVER (PARTITION BY c.c_custkey))::DOUBLE AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) rc
    """,
    doc="Rank customers by total order value (ref queries.sql:14-16 shape: A2 windowed SUM).",
    tags=("bi", "window", "dense_rank"),
    bench=True,
)
def bi_rank_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    # Windowed-SUM + DISTINCT == one row per customer: groupBy form (see
    # bi_rank_customers_by_order_count). Decimal sum keeps cross-engine
    # exactness; the cast to double happens once per group row.
    # Size-dispatched (r20, the bi-suppliers recipe): a single-column
    # decimal(18,4) sum needs NO magnitude proof (no product — see
    # grouped_measure_rank_local), so the gate is the footer count only.
    n_o = catalog_row_count(sf_dir, "orders")
    if (
        relational.LOCAL_TPCH_ROWS
        and n_o is not None
        and n_o <= relational.LOCAL_TPCH_ROWS
    ):
        return relational.grouped_measure_rank_local(
            joined.select("c_custkey", "c_name", "o_totalprice"),
            "c_custkey",
            "c_name",
            "dec4_sum",
            ("o_totalprice",),
            "revenue",
        )
    summed = joined.groupBy("c_custkey", "c_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue")
    )
    # Two-phase rank — see bi_rank_customers_by_order_count.
    return global_dense_rank(summed, "revenue").select(
        "c_custkey", "c_name", "revenue", "rnk"
    )


@register(
    "bi_rank_nations_by_avg_order",
    oracle="""
    SELECT rn.n_name, rn.avg_order, DENSE_RANK() OVER (ORDER BY rn.avg_order DESC) AS rnk
    FROM (
      SELECT DISTINCT n.n_name,
             ROUND((SUM(o.o_totalprice::DECIMAL(18,4)) OVER (PARTITION BY n.n_name))::DOUBLE
                   / (COUNT(o.o_orderkey) OVER (PARTITION BY n.n_name)), 0) AS avg_order
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) rn
    """,
    doc="Rank nations by ROUND(AVG(order value)) (ref queries.sql:77-84 shape: A3).",
    tags=("bi", "window", "avg"),
)
def bi_rank_nations_by_avg_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    w = W.partitionBy("n_name")
    # ROUND(sum/count) computed identically on both engines: exact decimal
    # sum -> double division -> round half-away-from-zero.
    avg_col = F.round(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
        / F.count("o_orderkey").over(w),
        0,
    )
    collapsed = joined.select("n_name", avg_col.alias("avg_order")).distinct()
    return collapsed.withColumn(
        "rnk", F.dense_rank().over(W.orderBy(F.desc("avg_order")))
    )


@register(
    "bi_rank_parts_by_shipped_qty",
    oracle="""
    SELECT rp.p_partkey, rp.p_name, rp.total_qty,
           DENSE_RANK() OVER (ORDER BY rp.total_qty DESC) AS rnk
    FROM (
      SELECT DISTINCT p.p_partkey, p.p_name,
             (SUM(l.l_quantity::DECIMAL(18,4)) OVER (PARTITION BY p.p_partkey))::DOUBLE AS total_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type LIKE '%ECO%'
    ) rp
    """,
    doc="Rank parts by shipped quantity, LIKE-filtered domain (ref queries.sql:7-11 shape: P8).",
    tags=("bi", "like", "window"),
    bench=True,
)
def bi_rank_parts_by_shipped_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type").like("%ECO%"))
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    # Windowed-SUM + DISTINCT == one row per part: groupBy form (see
    # bi_rank_customers_by_order_count).
    # Size-dispatched (r20, the bi-suppliers recipe): single-column
    # decimal sum, footer-count gate only (no product, no proof needed).
    n_li = catalog_row_count(sf_dir, "lineitem")
    if (
        relational.LOCAL_TPCH_ROWS
        and n_li is not None
        and n_li <= relational.LOCAL_TPCH_ROWS
    ):
        return relational.grouped_measure_rank_local(
            joined.select("p_partkey", "p_name", "l_quantity"),
            "p_partkey",
            "p_name",
            "dec4_sum",
            ("l_quantity",),
            "total_qty",
        )
    collapsed = joined.groupBy("p_partkey", "p_name").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_qty")
    )
    # Part-grain scales with SF -> two-phase rank, not a global window.
    return global_dense_rank(collapsed, "total_qty").select(
        "p_partkey", "p_name", "total_qty", "rnk"
    )


@register(
    "bi_rank_suppliers_by_region_revenue",
    oracle=f"""
    SELECT rs.s_suppkey, rs.s_name, rs.revenue,
           DENSE_RANK() OVER (ORDER BY rs.revenue DESC) AS rnk
    FROM (
      SELECT DISTINCT s.s_suppkey, s.s_name,
             ROUND(SUM({_REV_SQL}) OVER (PARTITION BY s.s_suppkey), 2)::DOUBLE AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name <> 'AFRICA'
    ) rs
    """,
    doc="Rank suppliers by discounted revenue outside one region "
    "(ref queries.sql:48-55 shape: J1 chain + P10 sentinel-exclusion + A2).",
    tags=("bi", "join", "window"),
    bench=True,
)
def bi_rank_suppliers_by_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") != "AFRICA")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # Size-dispatched (r20, VERDICT item 4): at bench scale the row is
    # one unsplittable scan task doing per-row BigDecimal revenue math
    # (the q1 cost shape) plus the rank's exchange. Below the gate the
    # decimal aggregate AND the dense rank run as ONE scaled-integer
    # mapInArrow task over the broadcast-join output (exactness:
    # operators/relational.py; the footer-stats magnitude proof is the
    # same one q1 uses). Above it the groupBy + two-phase rank below is
    # byte-unchanged (the 100 TB shape).
    n_li = catalog_row_count(sf_dir, "lineitem")
    if (
        relational.LOCAL_TPCH_ROWS
        and n_li is not None
        and n_li <= relational.LOCAL_TPCH_ROWS
        and relational.lineitem_magnitudes_safe(
            sf_dir, ("l_extendedprice", "l_discount")
        )
    ):
        return relational.supplier_revenue_rank_local(
            joined.select(
                "s_suppkey", "s_name", "l_extendedprice", "l_discount"
            )
        )
    # Windowed-SUM + DISTINCT == one row per supplier: groupBy form (see
    # bi_rank_customers_by_order_count). ROUND applies to the exact
    # decimal group sum — same value as the windowed form.
    collapsed = joined.groupBy("s_suppkey", "s_name").agg(
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue")
    )
    # Supplier-grain scales with SF -> two-phase rank, not a global window.
    return global_dense_rank(collapsed, "revenue").select(
        "s_suppkey", "s_name", "revenue", "rnk"
    )


@register(
    "bi_rank_order_years",
    oracle="""
    SELECT ry.order_year, ry.n_orders, DENSE_RANK() OVER (ORDER BY ry.n_orders DESC) AS rnk
    FROM (
      SELECT DISTINCT EXTRACT(year FROM o_orderdate)::INT AS order_year,
             COUNT(o_orderkey) OVER (PARTITION BY EXTRACT(year FROM o_orderdate)) AS n_orders
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 2000
    ) ry
    """,
    doc="Rank years by order count within a BETWEEN range (ref queries.sql:107-114 + P9).",
    tags=("bi", "between", "window"),
)
def bi_rank_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1995, 2000)
    )
    collapsed = o.select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.count("o_orderkey")
        .over(W.partitionBy(F.year("o_orderdate")))
        .alias("n_orders"),
    ).distinct()
    return collapsed.withColumn(
        "rnk", F.dense_rank().over(W.orderBy(F.desc("n_orders")))
    )


@register(
    "bi_rank_mktsegments",
    oracle="""
    SELECT rm.c_mktsegment, rm.n_customers,
           DENSE_RANK() OVER (ORDER BY rm.n_customers DESC) AS rnk
    FROM (
      SELECT DISTINCT c_mktsegment,
             COUNT(c_custkey) OVER (PARTITION BY c_mktsegment) AS n_customers
      FROM customer
      WHERE c_mktsegment <> 'MACHINERY'
    ) rm
    """,
    doc="Rank market segments excluding one (ref queries.sql:57-66 shape: P10 + A1).",
    tags=("bi", "window"),
)
def bi_rank_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") != "MACHINERY")
    collapsed = c.select(
        "c_mktsegment",
        F.count("c_custkey").over(W.partitionBy("c_mktsegment")).alias("n_customers"),
    ).distinct()
    return collapsed.withColumn(
        "rnk", F.dense_rank().over(W.orderBy(F.desc("n_customers")))
    )


@register(
    "bi_order_histogram",
    oracle="""
    SELECT DISTINCT EXTRACT(year FROM o_orderdate)::INT AS order_year,
           COUNT(o_orderkey) OVER (PARTITION BY EXTRACT(year FROM o_orderdate)) AS n_orders
    FROM orders
    ORDER BY order_year
    """,
    doc="Orders-per-year histogram, ascending (ref queries.sql:116-129 shape: O1).",
    tags=("bi", "histogram"),
)
def bi_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.count("o_orderkey")
            .over(W.partitionBy(F.year("o_orderdate")))
            .alias("n_orders"),
        )
        .distinct()
        .orderBy("order_year")
    )


@register(
    "bi_rank_priorities_by_revenue",
    oracle="""
    SELECT rp.o_orderpriority, rp.revenue,
           DENSE_RANK() OVER (ORDER BY rp.revenue DESC) AS rnk
    FROM (
      SELECT DISTINCT o_orderpriority,
             (SUM(o_totalprice::DECIMAL(18,4)) OVER (PARTITION BY o_orderpriority))::DOUBLE AS revenue
      FROM orders
    ) rp
    """,
    doc="Rank order priorities by total value (ref queries.sql:93-98 shape: venue-rank analog).",
    tags=("bi", "window"),
)
def bi_rank_priorities_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    collapsed = o.select(
        "o_orderpriority",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(W.partitionBy("o_orderpriority"))
        .cast("double")
        .alias("revenue"),
    ).distinct()
    return collapsed.withColumn("rnk", F.dense_rank().over(W.orderBy(F.desc("revenue"))))
