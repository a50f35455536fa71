"""Shared fixtures: one SparkSession per test run + the DuckDB oracle
comparator that mirrors the driver's correctness gate (row-count +
schema-width + order-insensitive value hash over name-sorted columns)."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from ut_data_engineering_group_project_2022_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ut-dwh-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver's pandas canonicalization distinguishes -0.0 from 0.0
        # (repr-level hash) — r5 burned a round on exactly this
        # (llm_embedding_covariance cell (5,9)).  Preserve the sign bit so a
        # -0.0 divergence fails LOCALLY instead of at the driver gate.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def canonical_rows(columns, rows):
    """Sort columns by name, stringify cells, sort rows — order-insensitive."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(columns, columns))], out


def compare_with_oracle(spark_df, duck_con, oracle_sql, limit=2_000_000):
    """Assert Spark result == DuckDB oracle result (driver-gate semantics)."""
    # The driver canonicalizes via pandas sort_values, which throws
    # `unhashable type: 'list'` on array/struct/map cells (r5
    # llm_embedding_quantize failure).  fetchall()/collect() happily yield
    # lists, so — as with the HUGEINT guard below — reject the TYPE locally:
    # serialize complex outputs (array_join / to_json) before registering.
    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("array", "struct", "map")
    ]
    assert not complex_cols, (
        f"spark output columns {complex_cols} are array/struct/map-typed — "
        "the driver's pandas canonicalizer cannot sort/hash list cells; "
        "serialize them (array_join / to_json) on both sides"
    )
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = duck_con.sql(oracle_sql)
    d_rows = [tuple(r) for r in rel.fetchall()]
    d_cols = list(rel.columns)

    # The driver compares via pandas, where DuckDB HUGEINT (the silent result
    # type of SUM over integer columns) renders as float64 while Spark emits
    # int64 — numerically identical values then hash-mismatch (round-1
    # llm_simhash_fingerprints failure). fetchall() yields Python ints and
    # can't see that, so reject the type itself: cast such SUMs to ::BIGINT.
    hugeint_cols = [
        c for c, t in zip(d_cols, rel.types) if str(t).upper() == "HUGEINT"
    ]
    assert not hugeint_cols, (
        f"oracle columns {hugeint_cols} are HUGEINT (driver pandas bridge "
        "renders these float64 and hash-mismatches Spark int64) — cast the "
        "aggregate to ::BIGINT in the oracle SQL"
    )
    duck_complex = [
        c
        for c, t in zip(d_cols, rel.types)
        if "[]" in str(t) or str(t).upper().startswith(("STRUCT", "MAP", "LIST"))
    ]
    assert not duck_complex, (
        f"oracle columns {duck_complex} are list/struct/map-typed — the "
        "driver's pandas canonicalizer cannot hash these; use "
        "array_to_string / to_json in the oracle SQL"
    )

    assert sorted(s_cols) == sorted(
        [c.lower() for c in d_cols]
    ) or sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, s_canon = canonical_rows(s_cols, s_rows)
    _, d_canon = canonical_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, (
        f"value mismatch ({len(mismatches)} rows); first 3: {mismatches[:3]}"
    )
