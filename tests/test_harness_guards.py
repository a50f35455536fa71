"""Prove the local harness faithfully mirrors the two driver-canonicalization
behaviors that burned round 5: pandas hashing distinguishes -0.0 from 0.0,
and crashes on array/struct cells.  Each guard must turn those into LOCAL
failures (VERDICT r5 'Next round' #2)."""

from __future__ import annotations

import pytest

from tests.conftest import _norm_cell, compare_with_oracle


def test_negative_zero_preserved_in_norm():
    assert _norm_cell(-0.0) == "-0.0"
    assert _norm_cell(0.0) == "0"
    assert _norm_cell(-0.0) != _norm_cell(0.0)


def test_negative_zero_query_fails_locally(spark, duck):
    # Spark emits +0.0, oracle emits -0.0 — numerically equal, but the
    # driver's pandas hash distinguishes them; the local compare must too.
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(0.0).alias("v"))
    with pytest.raises(AssertionError, match="value mismatch"):
        compare_with_oracle(df, duck, "SELECT -0.0::DOUBLE AS v")


def test_array_output_rejected_locally(spark, duck):
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.array(F.lit(1), F.lit(2)).alias("a"))
    with pytest.raises(AssertionError, match="array/struct/map"):
        compare_with_oracle(df, duck, "SELECT [1, 2] AS a")


def test_list_oracle_rejected_locally(spark, duck):
    from pyspark.sql import functions as F

    # Even a scalar Spark side must not be compared against a LIST oracle.
    df = spark.range(1).select(F.lit("1,2").alias("a"))
    with pytest.raises(AssertionError):
        compare_with_oracle(df, duck, "SELECT [1, 2] AS a")
