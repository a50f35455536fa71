"""Transform-layer tests (SURVEY M1): P1/P2/P5, D1/D2, F11-F13, N1, U2."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.fixtures import raw_arxiv
from ut_data_engineering_group_project_2022_spark.operators import transforms


def test_filter_withdrawn(spark):
    raw = raw_arxiv(spark)
    out = transforms.filter_withdrawn(raw)
    ids = {r["id"] for r in out.select("id").collect()}
    assert "0703.0003" not in ids
    assert out.count() == raw.count() - 1


def test_dedup_first_wins_keeps_lowest_id(spark):
    raw = raw_arxiv(spark)
    out = transforms.dedup_first_wins(raw, ("title", "authors"), order_col="id")
    ids = {r["id"] for r in out.select("id").collect()}
    assert "0701.0001" in ids  # first occurrence kept
    assert "0702.0002" not in ids  # normalise-duplicate dropped


def test_dedup_keep_last_prefers_recent(spark):
    raw = raw_arxiv(spark).withColumn(
        "k", F.concat(F.lit("same"))
    )
    out = transforms.dedup_keep_last(raw, ("k",), recency_col="update_date")
    assert out.count() == 1
    assert out.collect()[0]["update_date"] == "2021-06-01"


def test_latest_version(spark):
    out = transforms.latest_version(raw_arxiv(spark))
    row = out.filter(F.col("id") == "0701.0001").collect()[0]
    assert row["latest_version"] == "v2"
    row4 = out.filter(F.col("id") == "0704.0004").collect()[0]
    assert row4["latest_version"] == "v1"


def test_extract_authors_struct_and_affiliation_filter(spark):
    out = transforms.extract_authors(raw_arxiv(spark))
    row = out.filter(F.col("id") == "0701.0001").collect()[0]
    a = row["authors_extracted"]
    assert a[0]["family"] == "Smith" and a[0]["given"] == "John"
    assert a[0]["affiliation"] == []  # empty strings removed (F12)
    assert a[1]["affiliation"] == ["MIT"]


def test_reject_overlong_titles_split(spark):
    ok, rejected = transforms.reject_overlong_titles(raw_arxiv(spark))
    assert rejected.count() == 1
    assert rejected.collect()[0]["id"] == "0705.0005"
    assert ok.count() == raw_arxiv(spark).count() - 1


def test_clean_dataframe_end_to_end(spark):
    out = transforms.clean_dataframe(raw_arxiv(spark))
    ids = sorted(r["id"] for r in out.select("id").collect())
    # withdrawn (3) and dup (2) removed; 1, 4, 5 survive cleaning
    assert ids == ["0701.0001", "0704.0004", "0705.0005"]
    assert "comments" not in out.columns and "abstract" not in out.columns
    assert "latest_version" in out.columns and "authors_extracted" in out.columns
    # newline stripped from authors display string (F2)
    row = out.filter(F.col("id") == "0701.0001").collect()[0]
    assert "\n" not in row["authors"]
