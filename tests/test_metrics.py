"""Metric unit tests — the reference docstrings are executable specs
(ref metrics.py:121-124 hindex, 75-78 gindex, 34-37 euclidean)."""

from __future__ import annotations

import pytest

from ut_data_engineering_group_project_2022_spark.functions import metrics

SPEC_VECTOR = [6, 10, 5, 46, 0, 2]


def _df(spark, values):
    return spark.createDataFrame(
        [(1, v) for v in values], "author long, cites int"
    )


def test_hindex_matches_reference_spec(spark):
    out = metrics.hindex_agg(_df(spark, SPEC_VECTOR), "author", "cites").collect()
    assert out[0]["hindex"] == 4


def test_gindex_matches_reference_spec(spark):
    # Reference docstring (ref metrics.py:75-78) claims 6, but the code
    # (metrics.py:91-95) drops zero-cited papers first, shrinking the index
    # range to 5 elements -> the function actually returns 5. We match the
    # executable behavior, not the stale docstring.
    out = metrics.gindex_agg(_df(spark, SPEC_VECTOR), "author", "cites").collect()
    assert out[0]["gindex"] == 5


def test_euclidean_matches_reference_spec(spark):
    out = metrics.euclidean_agg(_df(spark, SPEC_VECTOR), "author", "cites").collect()
    assert out[0]["euclidean"] == pytest.approx(47.75982, abs=1e-4)


def test_hindex_edge_cases(spark):
    assert metrics.hindex_agg(_df(spark, [0, 0]), "author", "cites").collect()[0][
        "hindex"
    ] == 0
    assert metrics.hindex_agg(_df(spark, [100]), "author", "cites").collect()[0][
        "hindex"
    ] == 1


def test_python_parity_path(spark):
    """The applyInPandas grouped-map (UDAF path) equals the window form."""
    df = spark.createDataFrame(
        [(a, v) for a in (1, 2) for v in SPEC_VECTOR], "author long, cites int"
    )
    via_pandas = {
        r["author"]: (r["hindex"], r["gindex"])
        for r in metrics.metrics_apply_in_pandas(df, "author", "cites").collect()
    }
    h = {r["author"]: r["hindex"] for r in metrics.hindex_agg(df, "author", "cites").collect()}
    g = {r["author"]: r["gindex"] for r in metrics.gindex_agg(df, "author", "cites").collect()}
    for a in (1, 2):
        assert via_pandas[a] == (h[a], g[a]) == (4, 5)
