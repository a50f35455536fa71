"""The engine's query surface.

Importing this package populates the global query registry (see
``registry.py``): every module below registers its queries at import
time. ``all_queries()`` is what ``__spark_entry__.py``, the tests, and
``bench.py`` consume.
"""

from ut_data_engineering_group_project_2022_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    get_query,
    register,
    set_priority,
)

# Import for registration side effects. Module order here is alphabetical;
# the exposed ordering is curated by set_priority() below, which IS
# load-bearing: the driver's correctness gate checks only the first 50
# queries, so the 50-slot window is allocated explicitly.
from ut_data_engineering_group_project_2022_spark.plans import (  # noqa: F401,E402
    bi_queries,
    enrich_queries,
    graph_queries,
    llm_ops,
    metric_queries,
    operator_queries,
    star_queries,
    tpch_queries,
)

# Freshness POLICY (replaces the per-round hand-curated lists of rounds
# 1-4): the driver's 50-slot correctness window is allocated by reading
# the CORRECTNESS_r*.json history the driver itself writes to the repo
# root, ordering the registry as
#
#   1. queries whose LATEST driver row is a FAIL  (re-prove fixes first),
#   2. queries with no driver row yet             (close coverage gaps),
#   3. everything else, stalest-checked round first,
#
# with registration order as the deterministic tiebreak. Strict
# oldest-first rotation bounds worst-case staleness at
# ceil(n_queries / 50) rounds (~3 at the current 146) — the best any
# 50-slot window can do — and automatically rotates flagship families
# (star_q*, tpch_q*) back in as they age, with no list to maintain.
# Every oracle-carrying query additionally stays gated every session by
# tests/test_oracle_parity.py regardless of window position.


def _driver_history() -> dict[str, tuple[int, bool]]:
    """name -> (latest driver round with a row, that row passed).

    A row passes when err is None/'no_oracle' and no match flag is
    False ('no_oracle' is the driver's rows-only check for queries that
    are not SQL-expressible — a pass of the weaker gate).
    Missing/corrupt history files degrade to registration order.
    """
    import json
    from pathlib import Path

    hist: dict[str, tuple[int, bool]] = {}
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.rsplit("_r", 1)[1])
            rows = json.loads(p.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            ok = row.get("err") in (None, "no_oracle") and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            hist[name] = (rnd, ok)
    return hist


_HIST = _driver_history()
_REGISTERED = list(all_queries())


def _window_key(pos_name: tuple[int, str]) -> tuple[int, int, int]:
    pos, name = pos_name
    if name not in _HIST:
        return (1, 0, pos)
    rnd, ok = _HIST[name]
    return (0 if not ok else 2, rnd, pos)


set_priority(
    [name for _, name in sorted(enumerate(_REGISTERED), key=_window_key)]
)
