"""Dev helper: run named queries against their DuckDB oracles at sf0.001.

Usage: python tests/devcheck.py <query-name> [<query-name> ...]
       python tests/devcheck.py --prefix enrich_
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from tests.conftest import SF_DIR, TABLES, compare_with_oracle  # noqa: E402
from ut_data_engineering_group_project_2022_spark.plans import all_queries  # noqa: E402
from ut_data_engineering_group_project_2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    specs = all_queries()
    if args and args[0] == "--prefix":
        names = sorted(n for n in specs if n.startswith(args[1]))
    else:
        names = args
    spark = get_spark("devcheck", cpus=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failed = []
    for name in names:
        spec = specs[name]
        try:
            df = spec.spark(spark, SF_DIR)
            if spec.oracle is None:
                n = df.count()
                print(f"PASS (rows-only) {name}: {n} rows")
                continue
            compare_with_oracle(df, duck, spec.oracle)
            print(f"PASS {name}")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {str(exc)[:600]}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
