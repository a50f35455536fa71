"""Connector tests (SURVEY §2.1 S1-S9): schema-declared round trips and
the dead-letter append channel."""

from __future__ import annotations

import json

from ut_data_engineering_group_project_2022_spark.operators import star
from ut_data_engineering_group_project_2022_spark.schemas import (
    ARXIV_RAW,
    STAGING_MAIN,
)
from ut_data_engineering_group_project_2022_spark.sources import connectors
from tests.fixtures import staging_batch_1


def _fake_fetch(n):
    """Deterministic stand-in for the HTTP API (S1's external boundary)."""
    for i in range(n):
        yield {
            "id": f"9901.{i:04d}",
            "submitter": "someone",
            "authors": f"Author {i}",
            "title": f"Paper {i}",
            "comments": None,
            "journal-ref": None,
            "doi": None,
            "report-no": None,
            "categories": "math.CO",
            "license": None,
            "abstract": "A result.",
            "versions": [{"version": "v1", "created": "Mon"}],
            "update_date": "2020-01-01",
            "authors_parsed": [["A", f"B{i}", ""]],
        }


def test_api_batch_source(spark):
    df = connectors.api_batch_source(spark, _fake_fetch, ARXIV_RAW, batch_size=50)
    assert df.count() == 50
    assert df.schema == ARXIV_RAW


def test_staging_csv_roundtrip(spark, tmp_path):
    main, _ = staging_batch_1(spark)
    path = str(tmp_path / "main_csv")
    connectors.write_staging_csv(main, path)
    back = connectors.read_staging_csv(spark, path, STAGING_MAIN)
    assert back.count() == main.count()
    # CSV reads surface every field as nullable; compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in STAGING_MAIN.fields
    ]
    assert {r["id"] for r in back.collect()} == {r["id"] for r in main.collect()}


def test_json_snapshot_limit(spark, tmp_path):
    path = tmp_path / "dump.json"
    with open(path, "w") as f:
        for rec in _fake_fetch(20):
            f.write(json.dumps(rec) + "\n")
    df = connectors.read_json_snapshot(spark, str(path), ARXIV_RAW, 7)
    assert df.count() == 7


def test_dead_letter_appends(spark, tmp_path):
    main, _ = staging_batch_1(spark)
    path = str(tmp_path / "failures")
    connectors.append_dead_letter(main.limit(1), path, "first")
    connectors.append_dead_letter(main.limit(2), path, "second")
    back = spark.read.json(path)
    assert back.count() == 3
    assert set(r["_reject_reason"] for r in back.collect()) == {"first", "second"}


def test_staging_table_overwrite(spark, tmp_path):
    """S7: re-staging a batch replaces, never accumulates."""
    main, _ = staging_batch_1(spark)
    path = str(tmp_path / "staging_main")
    connectors.write_staging_table(main, path)
    connectors.write_staging_table(main, path)
    assert connectors.read_staging_table(spark, path).count() == main.count()


def test_star_save_load_roundtrip(spark, tmp_path):
    """S10 + durable commit: the star state survives a parquet round trip."""
    state = star.empty_star(spark)
    m1, a1 = staging_batch_1(spark)
    state = star.load_batch(state, m1, a1)
    state.save(str(tmp_path / "warehouse"))
    back = star.StarState.load(spark, str(tmp_path / "warehouse"))
    assert back.paper_fact.count() == state.paper_fact.count()
    assert back.dim_author.count() == state.dim_author.count()


def test_staging_orc_roundtrip(spark, tmp_path):
    """ORC staging sink/source: values and schema survive the round
    trip, and predicate pushdown reaches the ORC scan."""
    main, _ = staging_batch_1(spark)
    path = str(tmp_path / "staging_orc")
    connectors.write_staging_orc(main, path)
    connectors.write_staging_orc(main, path)  # overwrite, not accumulate
    back = connectors.read_staging_orc(spark, path)
    assert back.count() == main.count()
    assert set(back.columns) == set(main.columns)
    plan = back.filter(back[back.columns[0]].isNotNull())._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters: [" in plan, plan


def test_binary_file_ingestion(spark, tmp_path):
    """binaryFile source: glob pruning, extension typing, stable ids,
    and hand-off into the multimodal feature stage."""
    from ut_data_engineering_group_project_2022_spark.operators import multimodal
    from ut_data_engineering_group_project_2022_spark.sources import connectors

    media_dir = tmp_path / "drop"
    media_dir.mkdir()
    (media_dir / "a.png").write_bytes(b"\x89PNG-not-really" * 3)
    (media_dir / "b.wav").write_bytes(b"RIFFdata" * 5)
    (media_dir / "c.mp4").write_bytes(b"\x00\x00ftyp" * 20)
    (media_dir / "d.weird").write_bytes(b"??")
    (media_dir / "notes.txt").write_text("not media")

    df = connectors.ingest_media_files(
        spark, str(media_dir), pattern="*.{png,wav,mp4,weird}"
    )
    rows = {r.source_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.wav", "c.mp4", "d.weird"}  # txt pruned
    assert rows["a.png"].media_type == "image"
    assert rows["b.wav"].media_type == "audio"
    assert rows["c.mp4"].media_type == "video"
    assert rows["d.weird"].media_type == "binary"  # tolerant, not an error
    assert rows["b.wav"].byte_len == 40
    assert bytes(rows["c.mp4"].content) == b"\x00\x00ftyp" * 20
    # doc_id is a pure function of the path: re-listing reproduces it.
    again = connectors.ingest_media_files(
        spark, str(media_dir), pattern="*.png"
    ).collect()
    assert again[0].doc_id == rows["a.png"].doc_id

    # The ingested frame feeds the multimodal feature stage as-is.
    feats = {
        r.media_type: r
        for r in multimodal.media_features(df).collect()
    }
    import hashlib

    assert feats["audio"].byte_len == 40
    assert feats["audio"].checksum == hashlib.md5(b"RIFFdata" * 5).hexdigest()
    assert feats["image"].pseudo_width >= 1
