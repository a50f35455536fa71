"""Gender inference UDF — the engine's designated Python-UDF extension
point (SURVEY F14; ref dags/enrich.py:44-71).

The reference uses the `gender_guesser` package on the first given-name
token and folds its 6 labels to 3 (mostly_male->male, mostly_female->
female, andy/unknown->unknown; errors->unknown, ref README.md:186).

`gender_guesser` is not installed in this image, so the lookup is gated
behind an import-try with a deterministic fallback: the vendored
public-knowledge table in ``name_gender_data.py`` (a few hundred
curated names using the same six-label vocabulary — NOT a heuristic —
so tests are hermetic and results reproducible). The UDF is a
pandas_udf: Arrow-batched, one python call per batch, not per row.

The SCALE path is :func:`gender_table_df` + :func:`fold_gender_label`:
the same table as a broadcast lookup DataFrame joined on the lowercased
first name token, with the 6->3 fold as a JVM-side CASE — no Python in
the hot path at all. tests/test_enrich.py pins the join path equal to
the UDF path name-for-name.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.functions.name_gender_data import (
    NAME_GENDER,
)

try:  # pragma: no cover - exercised only where the package exists
    import gender_guesser.detector as _gg

    _DETECTOR = _gg.Detector()

    def _lookup(name: str) -> str:
        return _DETECTOR.get_gender(name)

except ImportError:  # deterministic vendored table (same label space)

    def _lookup(name: str) -> str:
        return NAME_GENDER.get(name.lower(), "unknown")


_FOLD = {
    "male": "male",
    "mostly_male": "male",
    "female": "female",
    "mostly_female": "female",
    "andy": "unknown",
    "unknown": "unknown",
}


def infer_gender_py(given: str | None) -> str:
    """First given-name token -> folded gender label (errors -> unknown)."""
    if not given:
        return "unknown"
    try:
        token = given.split(" ")[0].capitalize()
        return _FOLD.get(_lookup(token), "unknown")
    except Exception:
        return "unknown"


def _infer_series(given: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return given.map(infer_gender_py)


_UDF = None


def infer_gender(given: Column) -> Column:
    """Arrow-batched gender UDF. Constructed lazily on first use because
    ``pandas_udf`` needs an active SparkContext to parse its return type —
    a module-level decorator would break imports before session start."""
    global _UDF
    if _UDF is None:
        _UDF = F.pandas_udf(_infer_series, "string")
    return _UDF(given)


def with_gender(given_col: Column | str) -> Column:
    """Column expression applying the gender UDF."""
    return infer_gender(F.col(given_col) if isinstance(given_col, str) else given_col)


# --------------------------------------------------------------------------
# table-backed broadcast-join path (the scale path; zero Python per row)
# --------------------------------------------------------------------------


def gender_table_df(spark: SparkSession) -> DataFrame:
    """The vendored name->label table as a broadcastable DataFrame
    (few hundred rows; columns ``name`` lowercase, ``label`` in the
    six-label vocabulary)."""
    return spark.createDataFrame(
        sorted(NAME_GENDER.items()), "name string, label string"
    )


def first_token_key(given: Column) -> Column:
    """Join key mirroring :func:`infer_gender_py`'s token handling:
    lowercase first space-delimited token (NULL/empty -> no match ->
    'unknown' after the fold)."""
    return F.lower(F.element_at(F.split(given, " "), 1))


def fold_gender_label(label: Column) -> Column:
    """The 6->3 fold (ref README.md:186) as a JVM-side CASE — identical
    to the ``_FOLD`` dict the UDF applies."""
    return (
        F.when(label.isin("male", "mostly_male"), F.lit("male"))
        .when(label.isin("female", "mostly_female"), F.lit("female"))
        .otherwise(F.lit("unknown"))
    )


def join_gender(
    df: DataFrame, given_col: str, out_col: str = "gender"
) -> DataFrame:
    """Attach the folded gender via a broadcast lookup join — the
    100 TB path (the UDF above stays as the documented Python
    extension point)."""
    # Collision-proof aliases: dropping bare 'name'/'label' after the
    # join silently clobbered caller columns with those names (r7
    # advisory) — the lookup side now only ever contributes __g-prefixed
    # columns.
    tbl = F.broadcast(
        gender_table_df(df.sparkSession).select(
            F.col("name").alias("__gname"), F.col("label").alias("__glabel")
        )
    )
    return (
        df.withColumn("__gk", first_token_key(F.col(given_col)))
        .join(tbl, F.col("__gk") == F.col("__gname"), "left")
        .withColumn(out_col, fold_gender_label(F.col("__glabel")))
        .drop("__gk", "__gname", "__glabel")
    )
