"""Table catalog for the driver-generated test data (TESTDATA.md).

All queries in ``plans/`` resolve tables through here so the storage
layout (parquet per table) is a single point of change — swapping in a
partitioned / bucketed layout for the 100 TB deployment touches only
this module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Session-process schema cache (r19, guide §1.2 "per-task work" at the
#: smallest grain: job count). Every bare ``spark.read.parquet(path)``
#: runs a one-task schema-inference JOB before the query proper — ~165 ms
#: of pure dispatch latency at bench scale, paid once PER TABLE PER QUERY
#: (tpch_q5 touches six tables: ~1 s of its 1.2 s warm time was footer
#: jobs). The FIRST read of a path still infers (one job, honest), then
#: the StructType is reused via ``spark.read.schema(...)`` which runs
#: ZERO jobs. Keyed by (path, mtime_ns, size) so a rewritten file
#: re-infers; the cache holds metadata only (never rows), is process-
#: local, and the schema a reuse supplies is byte-identical to what
#: inference would return — so plans, pushdowns and results are
#: unchanged. At 100 TB the same trick amortizes footer listing across
#: a session's queries, exactly like Spark's own file-index cache
#: (guide §6 "file listing").
_SCHEMA_CACHE: dict = {}


def _stat_key(path: str):
    st = os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = _stat_key(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _events(spark, sf_dir)
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts across testdata generations.

    Older generations wrote parquet TIMESTAMP(NANOS), which vanilla Spark
    rejects (PARQUET_TYPE_ILLEGAL) — read nanos as long and rebuild a
    microsecond timestamp (floor-truncation, matching DuckDB's ns -> us
    coercion). Newer generations write TIMESTAMP_MICROS with
    isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ — cast to
    session-timezone TIMESTAMP (session tz is pinned UTC, so the instant
    is unchanged and matches DuckDB's UTC-naive reading)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _read_parquet(spark, f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # Integer DIV, not `/`: float division of ~1.7e18 ns exceeds
        # double's 2^53 mantissa and lands some timestamps 1 us off
        # DuckDB's exact ns -> us truncation.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the spark.sql path)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
