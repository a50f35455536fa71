"""Refit the probe-conditioned expected bands from the committed records.

The fit consumed by tools/band_check.py (FITS / FLAT / PROBE_RANGE_MS)
and documented in bench_snapshots/README.md is reproduced by running
this script — it enumerates every committed record that carries
job_latency_ms_* probes (driver BENCH_r*.json + bench_snapshots/*.json,
flagged records included: the flag marks the RECORD low-trust for
perf claims, but its (probe, value) pair is exactly the loud-minute
evidence the regression needs to cover loud minutes), fits
value_s = a + b * (probe_mean3 / 100 ms) by ordinary least squares,
and prints the band_check constants plus the README markdown table.

Usage:
    python tools/refit_bands.py            # print refit constants
"""
import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
ROWS = [
    "graph_connected_components",
    "graph_pagerank",
    "star_load_seconds",
    "llm_semdedup",
    "graph_louvain",
]
# graph_louvain stays probe-independent (R^2 <= 0.16 under every
# regressor tried at n=10 and again at n=14): flat mean +/- 2 sigma.
# Flat rows fit on FLAG-NULL records only: an OLS row has probe_mean3
# to absorb a flagged record's weather, a flat band does not — feeding
# it a noise_flag'd reading (BENCH_r15 louvain 10.936, a traced
# mid-suite episode) just teaches the band to accept weather
# (sigma 0.79 -> 1.28 when tried).
FLAT_ROWS = {"graph_louvain"}


def load_records() -> list[tuple[str, float, dict]]:
    out = []
    files = sorted(REPO.glob("BENCH_r*.json")) + sorted(
        (REPO / "bench_snapshots").glob("*.json")
    )
    for f in files:
        d = json.loads(f.read_text())
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        probes = [d.get(f"job_latency_ms_{k}") for k in ("start", "warm", "end")]
        if any(p is None for p in probes) or d.get("sf") != 0.1:
            continue
        out.append((f.name, sum(probes) / 3, d))
    return out


def ols(xs: list[float], ys: list[float]) -> tuple[float, float, float, float]:
    """Return (a, b, sigma, r2) for y = a + b*x with sigma of residuals."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    b = sxy / sxx
    a = my - b * mx
    resid = [y - (a + b * x) for x, y in zip(xs, ys)]
    sse = sum(r * r for r in resid)
    sst = sum((y - my) ** 2 for y in ys)
    sigma = math.sqrt(sse / (n - 2)) if n > 2 else float("nan")
    r2 = 1 - sse / sst if sst else float("nan")
    return a, b, sigma, r2


def main() -> None:
    records = load_records()
    names = [n for n, _, _ in records]
    p3s = [p for _, p, _ in records]
    print(f"# n={len(records)} probe-carrying committed records:")
    for n, p, _ in records:
        print(f"#   {n}: probe_mean3 {p:.1f} ms")
    print(f"# probe range {min(p3s):.1f}-{max(p3s):.1f} ms\n")

    fits, flat = {}, {}
    for row in ROWS:
        pairs = []
        for _, p3, d in records:
            if row in FLAT_ROWS and d.get("noise_flag"):
                continue
            v = d.get(row) if row == "star_load_seconds" else d["queries"].get(row)
            if v is not None:
                pairs.append((p3 / 100.0, v))
        xs, ys = zip(*pairs)
        a, b, sigma, r2 = ols(list(xs), list(ys))
        n = len(ys)
        mean = sum(ys) / n
        fsig = math.sqrt(sum((y - mean) ** 2 for y in ys) / (n - 1))
        if row in FLAT_ROWS:
            flat[row] = {"mean": round(mean, 3), "sigma": round(fsig, 3)}
            print(f"# {row}: flat {mean:.3f} +/- 2*{fsig:.3f} (ols R2 {r2:.2f})")
        else:
            fits[row] = {"a": round(a, 3), "b": round(b, 3), "sigma": round(sigma, 3)}
            print(f"# {row}: {a:.3f} + {b:.3f}*p, sigma {sigma:.3f}, R2 {r2:.2f}")
    print("\nFITS =", json.dumps(fits, indent=1))
    print("FLAT =", json.dumps(flat, indent=1))
    print(f"PROBE_RANGE_MS = ({min(p3s):.1f}, {max(p3s):.1f})")
    print("\n# README table rows (@90/110/130/150 ms):")
    for row, f in fits.items():
        cells = []
        for p in (0.9, 1.1, 1.3, 1.5):
            e = f["a"] + f["b"] * p
            cells.append(f"{e:.2f} [{e - 2 * f['sigma']:.2f}-{e + 2 * f['sigma']:.2f}]")
        print(f"| {row} | {f['a']:.2f} + {f['b']:.2f}·p | {f['sigma']:.2f} | | "
              + " | ".join(cells) + " |")
    for row, f in flat.items():
        print(f"| {row} | probe-independent | {f['sigma']:.2f} | | "
              f"{f['mean']:.2f} ± {2 * f['sigma']:.2f} (flat) | — | — | — |")


if __name__ == "__main__":
    sys.exit(main())
