"""Source/sink connectors (SURVEY §2.1, S1-S10).

The reference moves data between stages as whole files in /tmp/data
(JSON between tasks, CSV between DAGs; ref dags/api_to_neo4j.py:108,
149-150, dags/pop_DWH.py:59,93) and into Postgres via row-wise
string-built INSERTs (ref pop_DWH.py:67-136). Here every boundary is a
schema-declared Spark reader/writer:

  S1  HTTP JSON batch source   -> `api_batch_source` (pluggable fetcher,
      the engine ships createDataFrame; live HTTP stays outside)
  S2  JSON inter-task IR       -> `read_json` / `write_json`
  S3  dead-letter JSONL append -> `append_dead_letter`
  S4  CSV staging interchange  -> `read_staging_csv` / `write_staging_csv`
  S5  line-JSON snapshot + N   -> `read_json_snapshot`
  S6/S7 relational staging with truncate-before-load -> overwrite-mode
      parquet (`write_staging_table`) — set-based, no string SQL
  S9  file-arrival trigger     -> `stream_json_source` /
      `stream_csv_source` (Structured Streaming tracks processed files;
      no sensor/delete dance — SURVEY T2)
  S10 DDL bootstrap            -> star.empty_star (operators/star.py)

Scale notes: all readers take explicit schemas (no inference pass over
100 TB); CSV/JSON readers parallelize by file split; the streaming
sources bound per-trigger work with `maxFilesPerTrigger`.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ut_data_engineering_group_project_2022_spark.schemas import ARXIV_RAW

Fetcher = Callable[[int], Iterable[Mapping]]


def api_batch_source(
    spark: SparkSession,
    fetch: Fetcher,
    schema: T.StructType = ARXIV_RAW,
    batch_size: int = 50,
) -> DataFrame:
    """S1 (ref api_to_neo4j.py:104-105; 50-record batches, conf.py:8):
    one API fetch -> one DataFrame. `fetch(n)` is the external-world
    boundary (an HTTP client in production, a deterministic fake in
    tests); the engine owns only the rows -> DataFrame step."""
    return spark.createDataFrame(list(fetch(batch_size)), schema)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S2 read side (ref api_to_neo4j.py:113,123): schema-declared, no
    inference."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2 write side (ref api_to_neo4j.py:108,154)."""
    df.write.mode(mode).json(path)


def append_dead_letter(df: DataFrame, path: str, reason: str) -> None:
    """S3 (ref api_to_neo4j.py:115-119,131-135): rejected rows appended
    as JSONL with a reason tag; never truncated."""
    df.withColumn("_reject_reason", F.lit(reason)).write.mode("append").json(path)


def read_json_snapshot(
    spark: SparkSession, path: str, schema: T.StructType, n: int
) -> DataFrame:
    """S5 (ref enrich.py:219-224): first-N-records view of a line-JSON
    dump (the Kaggle arXiv snapshot pattern)."""
    return spark.read.schema(schema).json(path).limit(n)


def write_staging_csv(df: DataFrame, path: str) -> None:
    """S4 write side (ref api_to_neo4j.py:149-150): header CSV interchange."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_staging_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """S4 read side (ref pop_DWH.py:59,93): schema-declared header CSV."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_staging_table(df: DataFrame, path: str) -> None:
    """S6+S7 (ref pop_DWH.py:48-56,67-136): the truncate-then-insert
    staging pattern collapses to one overwrite-mode columnar write."""
    df.write.mode("overwrite").parquet(path)


def read_staging_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_staging_orc(df: DataFrame, path: str) -> None:
    """ORC variant of the columnar staging sink — same overwrite
    semantics as S6/S7, for consumers standardized on ORC (both are
    splittable, predicate-pushdown columnar formats; interchange only,
    the engine's own tables stay parquet)."""
    df.write.mode("overwrite").orc(path)


def read_staging_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def stream_json_source(
    spark: SparkSession,
    directory: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S9 as Structured Streaming (SURVEY T2): the file source tracks
    processed files in the checkpoint — replaces the reference's
    FileSensor poll + delete-after-load handshake (ref pop_DWH.py:25-41,
    306-307)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(directory)


def stream_csv_source(
    spark: SparkSession,
    directory: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema).option("header", True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(directory)


# -- Raw media ingestion (binaryFile source) --------------------------------

_EXT_MEDIA = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "avi": "video", "mkv": "video",
}


def read_binary_files(
    spark: SparkSession,
    directory: str,
    pattern: str = "*",
    recursive: bool = False,
) -> DataFrame:
    """Raw-file ingestion via Spark's ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content). ``pattern``
    prunes at LISTING time (pathGlobFilter — excluded files are never
    opened), and the listing itself is distributed, so a 100 TB media
    drop shards across executors with no driver-side file walk. Content
    arrives as a columnar binary column — the entry point of the
    multimodal pipeline (operators/multimodal.py)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(directory)
    )


def ingest_media_files(
    spark: SparkSession,
    directory: str,
    pattern: str = "*",
    recursive: bool = False,
) -> DataFrame:
    """binaryFile listing -> the multimodal media frame: stable doc_id
    (60-bit md5 of the file path — reproducible across re-runs and
    listing orders), media_type inferred from the file extension
    (unknown extensions pass through as 'binary' rather than erroring —
    dead-letter-style tolerance at the ingest edge), raw bytes, and
    provenance columns. Output plugs directly into media_features /
    resize_image / sample_frames."""
    from ut_data_engineering_group_project_2022_spark.functions.text import (
        md5_int60,
    )

    raw = read_binary_files(spark, directory, pattern, recursive)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    ext_map = F.create_map(
        *[F.lit(x) for kv in _EXT_MEDIA.items() for x in kv]
    )
    return raw.select(
        md5_int60(F.col("path")).alias("doc_id"),
        F.coalesce(ext_map.getItem(ext), F.lit("binary")).alias("media_type"),
        "content",
        F.col("path").alias("source_path"),
        F.col("length").cast("long").alias("byte_len"),
    )
