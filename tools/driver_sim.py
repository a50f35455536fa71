"""Driver simulator: vanilla session + DuckDB oracle comparison.

Replicates the correctness driver's contract: imports __spark_entry__
with a default-config SparkSession (ANSI mode on, 200 shuffle
partitions — the risky driver defaults), runs entry() at sf0.001, then
compares queries() vs oracle_sql() at sf0.01 with driver-faithful
canonicalization (columns sorted by name, -0.0 sign preserved,
datetime columns stringified column-wise via astype(str)).

Usage (run from OUTSIDE the repo so nothing leaks from the cwd):

    python tools/driver_sim.py window50          # first 50 = the
                                                 # driver's round window
    python tools/driver_sim.py all               # full registry
    python tools/driver_sim.py chunk0/5          # slice 0 of 5 (the
                                                 # full sweep split to
                                                 # fit a command cap)
    python tools/driver_sim.py name1,name2       # explicit list

Set SIM_SWEEP_OUT=<path> to dump the per-query results as a JSON
artifact — the per-round registry-wide sweep committed as
bench_snapshots/r{N}_sweep.json is generated this way (chunks merged
by the caller). Exit code is non-zero on any MISMATCH/ERROR.
"""
import decimal
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # Column-wise stringify FIRST for datetime-ish columns (driver
    # behavior: astype(str) renders midnight datetime64 date-only).
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime64", "date")):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)

    def tok(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        # Decimal folds through the float branch (r13 ADVICE): Spark
        # DecimalType arrives via toPandas as decimal.Decimal while the
        # DuckDB side reads float64 — str() would render '4.50' vs
        # '4.5' and ghost-MISMATCH equal values for any query that
        # skips the ::DOUBLE cast convention.
        if isinstance(v, decimal.Decimal):
            v = float(v)
        if isinstance(v, float):
            if math.copysign(1.0, v) < 0 and v == 0.0:
                return "-0.0"
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(tok(x) for x in v) + "]"
        return str(v)

    return "\n".join(
        "|".join(tok(v) for v in row) for row in df.itertuples(index=False)
    )


def main(names: list[str]) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    # 1. entry() smoke at sf0.001
    r = e.entry(spark).collect()
    assert len(r) == 6, f"entry() returned {len(r)} rows, expected 6"
    print(f"[sim] entry(): {len(r)} rows OK", flush=True)

    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    results = {}
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
            if name not in oracles:
                results[name] = {
                    "status": "no_oracle",
                    "rows": len(spdf),
                    "sec": round(time.monotonic() - t0, 2),
                }
                print(f"[sim] {name}: no_oracle rows={len(spdf)}", flush=True)
                continue
            odf = con.execute(oracles[name]).fetchdf()
            rows_match = len(spdf) == len(odf)
            schema_match = sorted(spdf.columns) == sorted(odf.columns)
            hash_match = canon(spdf) == canon(odf) if rows_match and schema_match else False
            ok = rows_match and schema_match and hash_match
            results[name] = {
                "status": "match" if ok else "MISMATCH",
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(spdf),
                "oracle_rows": len(odf),
                "sec": round(time.monotonic() - t0, 2),
            }
            print(
                f"[sim] {name}: {'OK' if ok else 'MISMATCH'}"
                f" ({len(spdf)}/{len(odf)} rows, {results[name]['sec']}s)",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            results[name] = {"status": "ERROR", "err": repr(ex)[:300]}
            print(f"[sim] {name}: ERROR {ex!r}", flush=True)

    bad = {n: r for n, r in results.items() if r["status"] not in ("match", "no_oracle")}
    print(json.dumps({"checked": len(results), "bad": bad}, indent=1))
    import os

    out = os.environ.get("SIM_SWEEP_OUT")
    if out:
        import datetime

        summary = {
            "sweep_date": datetime.date.today().isoformat(),
            "sf_dir": SF_DIR,
            "session": "vanilla local[8], ANSI on, 200 shuffle partitions",
            "checked": len(results),
            "match": sum(1 for r in results.values() if r["status"] == "match"),
            "no_oracle": sorted(
                n for n, r in results.items() if r["status"] == "no_oracle"
            ),
            "failures": bad,
            "queries": results,
        }
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[sim] sweep artifact written to {out}")
    spark.stop()
    sys.exit(1 if bad else 0)


def select_names(arg: str, registered: list[str]) -> list[str]:
    """Resolve a CLI selection arg to query names.

    Raises SystemExit on invalid selections (out-of-range chunk index,
    unknown names, empty explicit selection). Returns [] ONLY for a
    structurally valid but empty tail chunk - the caller treats that as
    a no-op success (r14 ADVICE: per = ceil(len/n) can leave chunk
    indices >= ceil(len/per) empty, e.g. 10 queries split chunk5/6, and
    a caller looping i in range(n) must not see a spurious failure;
    the hard failure stays for typo'd explicit name lists / window50).
    """
    if arg == "window50":
        # Registration order here IS the driver's window order:
        # plans/__init__.py set_priority() reorders the registry
        # stalest-first from the CORRECTNESS_r*.json history, and the
        # driver's 50-row correctness window is the first 50 entries of
        # queries() in that order. chunkI/N below deliberately differs -
        # it sorts alphabetically so sweep slices stay stable across
        # rounds while the priority order rotates (r13 ADVICE: the two
        # orderings differ by design; only window50 mirrors the driver).
        names = registered[:50]
    elif arg == "all":
        names = registered
    elif arg.startswith("chunk"):
        # chunkI/N - sorted registry split into N contiguous slices so
        # the full sweep fits the 600 s background-command cap.
        i, n = map(int, arg.removeprefix("chunk").split("/"))
        if not (0 <= i < n):
            sys.exit(f"chunk index out of range: {arg} (need 0 <= i < n)")
        allq = sorted(registered)
        per = -(-len(allq) // n)
        names = allq[i * per : (i + 1) * per]
        if not names:
            print(
                f"[sim] {arg}: empty tail slice ({len(allq)} queries, "
                f"{per}/chunk) - no-op success",
                file=sys.stderr,
            )
            return []
    else:
        names = arg.split(",")
    # A typo'd selection must fail loudly, not print checked=0 and exit
    # 0 - an empty slice would make a sweep chunk look clean while
    # covering zero queries (r13 ADVICE).
    if not names:
        sys.exit(f"empty query selection for arg {arg!r}")
    unknown = [n for n in names if n not in registered]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    return names


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "window50"
    from ut_data_engineering_group_project_2022_spark.plans import all_queries

    names = select_names(arg, list(all_queries()))
    if not names:  # valid empty tail chunk - no-op success
        sys.exit(0)
    main(names)
