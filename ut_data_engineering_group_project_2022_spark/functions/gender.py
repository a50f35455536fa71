"""Gender inference UDF — the engine's designated Python-UDF extension
point (SURVEY F14; ref dags/enrich.py:44-71).

The reference uses the `gender_guesser` package on the first given-name
token and folds its 6 labels to 3 (mostly_male->male, mostly_female->
female, andy/unknown->unknown; errors->unknown, ref README.md:186).

`gender_guesser` is not installed in this image, so the lookup is gated
behind an import-try with a deterministic fallback table (a small
explicit dict — NOT a heuristic — so tests are hermetic and results
reproducible). The UDF is a pandas_udf: Arrow-batched, one python call
per batch, not per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pragma: no cover - exercised only where the package exists
    import gender_guesser.detector as _gg

    _DETECTOR = _gg.Detector()

    def _lookup(name: str) -> str:
        return _DETECTOR.get_gender(name)

except ImportError:  # deterministic fallback table
    _FALLBACK = {
        "john": "male",
        "james": "male",
        "robert": "male",
        "michael": "male",
        "david": "male",
        "andrea": "mostly_female",
        "mary": "female",
        "anna": "female",
        "maria": "female",
        "elena": "female",
        "kim": "andy",
    }

    def _lookup(name: str) -> str:
        return _FALLBACK.get(name.lower(), "unknown")


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
