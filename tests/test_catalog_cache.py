"""The catalog schema cache (r19): reused reads must be byte-identical
to inferred reads, and a rewritten file must bust the cache."""

from __future__ import annotations

import pytest

from ut_data_engineering_group_project_2022_spark import catalog

SF_DIR = "/root/testdata/sf0.001"


def test_cached_read_schema_and_rows_identical(spark):
    catalog._SCHEMA_CACHE.clear()
    first = catalog.table(spark, SF_DIR, "lineitem")  # infers (cold)
    assert catalog._SCHEMA_CACHE  # populated
    second = catalog.table(spark, SF_DIR, "lineitem")  # schema-supplied
    assert second.schema == first.schema
    a = sorted(map(tuple, first.collect()))
    b = sorted(map(tuple, second.collect()))
    assert a == b


def test_cached_read_events_normalization_survives(spark):
    catalog._SCHEMA_CACHE.clear()
    first = catalog.table(spark, SF_DIR, "events")
    second = catalog.table(spark, SF_DIR, "events")
    assert second.schema == first.schema
    assert second.schema["ts"].dataType.simpleString() == "timestamp"
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, second.collect())
    )


def test_rewritten_file_busts_cache(spark, tmp_path):
    p = tmp_path / "t.parquet"
    spark.range(3).select("id").write.mode("overwrite").parquet(str(p))
    df1 = catalog._read_parquet(spark, str(p))
    assert [f.name for f in df1.schema.fields] == ["id"]
    # rewrite with a DIFFERENT schema: the stat key must change
    spark.range(3).selectExpr("id", "id * 2 AS dbl").write.mode(
        "overwrite"
    ).parquet(str(p))
    df2 = catalog._read_parquet(spark, str(p))
    assert [f.name for f in df2.schema.fields] == ["id", "dbl"]
    assert df2.count() == 3


def test_unknown_table_still_rejected(spark):
    with pytest.raises(KeyError):
        catalog.table(spark, SF_DIR, "nope")


def test_row_count_unexpected_layouts_return_none(tmp_path):
    """r20 (r19 ADVICE): a hive-partitioned/nested directory or a
    directory with no top-level parquet file must return None (gates
    fall back to the bounded limit-count), never 0 — 0 falsely 'proves'
    an arbitrarily large dataset small."""
    # the real flat layouts still count exactly
    n = catalog.parquet_row_count(SF_DIR, "lineitem")
    assert isinstance(n, int) and n > 0
    # hive-partitioned: any subdirectory entry -> None
    d = tmp_path / "lineitem.parquet"
    (d / "l_shipmode=AIR").mkdir(parents=True)
    assert catalog.parquet_row_count(str(tmp_path), "lineitem") is None
    # directory with no top-level *.parquet files -> None
    d2 = tmp_path / "orders.parquet"
    d2.mkdir()
    (d2 / "_SUCCESS").write_text("")
    assert catalog.parquet_row_count(str(tmp_path), "orders") is None
