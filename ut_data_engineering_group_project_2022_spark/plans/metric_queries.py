"""Metric queries: h-index / g-index / euclidean index per supplier.

The 'citations' of a supplier are the quantities of its lineitems —
same ordered-set-aggregate shape as the reference's per-author citation
metrics (SURVEY A4-A6; ref dags/metrics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.catalog import table
from ut_data_engineering_group_project_2022_spark.functions.metrics import (
    euclidean_agg,
    gindex_agg,
    hindex_agg,
)
from ut_data_engineering_group_project_2022_spark.plans.registry import register


def _qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_suppkey", F.col("l_quantity").cast("int").alias("qty"))


@register(
    "metric_hindex",
    oracle="""
    SELECT l_suppkey, MAX(CASE WHEN qty >= rn THEN rn ELSE 0 END)::INT AS hindex
    FROM (
      SELECT l_suppkey, l_quantity::INT AS qty,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY l_quantity::INT DESC) AS rn
      FROM lineitem
    ) t GROUP BY l_suppkey
    """,
    doc="h-index per supplier over lineitem quantities (SURVEY A4; "
    "ref metrics.py:99-143) as pure window+agg.",
    tags=("metric", "window"),
    bench=True,
)
def metric_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hindex_agg(_qty(spark, sf_dir), "l_suppkey", "qty")


@register(
    "metric_gindex",
    oracle="""
    SELECT l_suppkey, MAX(CASE WHEN cum >= rn * rn THEN rn ELSE 0 END)::INT AS gindex
    FROM (
      SELECT l_suppkey,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY qty DESC) AS rn,
             SUM(qty) OVER (PARTITION BY l_suppkey ORDER BY qty DESC
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM (
        SELECT l_suppkey, l_quantity::INT::BIGINT AS qty FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_quantity::INT > 0
      )
    ) t GROUP BY l_suppkey
    """,
    doc="g-index per supplier (SURVEY A5; ref metrics.py:56-96): cumsum over "
    "desc-sorted values, max n with cum >= n^2.",
    tags=("metric", "window"),
)
def metric_gindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gindex_agg(_qty(spark, sf_dir), "l_suppkey", "qty")


@register(
    "metric_euclidean",
    oracle="""
    SELECT l_suppkey,
           ROUND(sqrt((SUM(l_quantity::INT::DECIMAL(18,4)
                           * l_quantity::INT::DECIMAL(18,4)))::DOUBLE), 6) AS euclidean
    FROM lineitem GROUP BY l_suppkey
    """,
    doc="Euclidean index per supplier (SURVEY A6; ref metrics.py:12-53): "
    "sqrt of exact decimal sum of squares.",
    tags=("metric",),
)
def metric_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return euclidean_agg(_qty(spark, sf_dir), "l_suppkey", "qty")
