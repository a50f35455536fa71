"""Refit the probe-conditioned expected bands from the committed records.

The fit consumed by tools/band_check.py (FITS / FLAT / PROBE_RANGE_MS)
and documented in bench_snapshots/README.md is reproduced by running
this script — it enumerates every COMMITTED record that carries
job_latency_ms_* probes (git-tracked BENCH_r*.json +
bench_snapshots/*.json; r16 ADVICE: globbing the working tree silently
included untracked files, so two operators could get different fits
from the same commit — untracked probe-carrying files are now warned
about and skipped), fits value_s = a + b * (probe_mean3 / 100 ms) by
ordinary least squares, and prints the band_check constants plus the
README markdown table.

Flat-row trimming (r16 ADVICE): a FLAT-row reading that the COMMITTED
band_check constants do not read "inside" is excluded from the refit
and printed as an exclusion — a flat band has no regressor to absorb
weather, so fitting on episode readings teaches the band to accept the
very weather it exists to flag (observed live: the two 12.2 s louvain
episode readings took the flat band from 6.99±2*0.70 to 7.67±2*1.93
when included). OLS rows deliberately keep ALL records, outliers and
flagged included — probe_mean3 is their weather absorber, their sigma
should reflect honest residuals, and check-time trace adjudication
(band_check.py, r17) handles the episode-miss case the fit cannot.
The committed constants are therefore a FIXED POINT of this script:
refitting at HEAD reproduces them exactly
(tests/test_harness_guards.py pins this), and adopting a genuinely
shifted flat population — e.g. after a code change or on a first
quiet-band record — is a deliberate re-base: run the script, review
the printed exclusions, paste the new constants, re-run until stable,
and document the move in bench_snapshots/README.md.

Usage:
    python tools/refit_bands.py            # print refit constants
"""
import json
import math
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))
import band_check  # noqa: E402  (committed constants = trim reference)

ROWS = [
    "graph_connected_components",
    "graph_pagerank",
    "star_load_seconds",
    "llm_semdedup",
    "graph_louvain",
]
# graph_louvain stays probe-independent (R^2 <= 0.16 under every
# regressor tried at n=10 and again at n=14): flat mean +/- 2 sigma.
# Flat rows additionally fit on FLAG-NULL records only: an OLS row has
# probe_mean3 to absorb a flagged record's weather, a flat band does
# not.
FLAT_ROWS = {"graph_louvain"}


def load_records(warnings: list[str] | None = None) -> list[tuple[str, float, dict]]:
    """(name, probe_mean3, payload) for committed probe-carrying records.

    Enumerates via `git ls-files` so the fit is a function of the
    commit, not the working tree; probe-carrying files matching the
    record globs but NOT tracked are reported in `warnings`.
    """
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "BENCH_r*.json", "bench_snapshots/*.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    candidates = sorted(REPO.glob("BENCH_r*.json")) + sorted(
        (REPO / "bench_snapshots").glob("*.json")
    )
    out = []
    for f in candidates:
        d = json.loads(f.read_text())
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        probes = [d.get(f"job_latency_ms_{k}") for k in ("start", "warm", "end")]
        if any(p is None for p in probes) or d.get("sf") != 0.1:
            continue
        rel = str(f.relative_to(REPO))
        if rel not in tracked:
            if warnings is not None:
                warnings.append(
                    f"untracked probe-carrying file skipped: {rel} "
                    "(commit it to include it in the fit)"
                )
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


def _inside_committed(row: str, value: float, p3: float) -> bool:
    """Does the COMMITTED band read this (row, value, probe) inside?"""
    if row in band_check.FLAT:
        f = band_check.FLAT[row]
        return abs(value - f["mean"]) <= 2 * f["sigma"]
    f = band_check.FITS[row]
    exp = f["a"] + f["b"] * p3 / 100.0
    return abs(value - exp) <= 2 * f["sigma"]


def refit() -> tuple[dict, dict, tuple[float, float], list[str]]:
    """(FITS, FLAT, PROBE_RANGE_MS, log lines) from the tracked records."""
    warnings: list[str] = []
    records = load_records(warnings)
    p3s = [p for _, p, _ in records]
    lines = list(warnings)
    lines.append(f"# n={len(records)} probe-carrying committed records:")
    for n, p, _ in records:
        lines.append(f"#   {n}: probe_mean3 {p:.1f} ms")
    lines.append(f"# probe range {min(p3s):.1f}-{max(p3s):.1f} ms")

    fits, flat = {}, {}
    for row in ROWS:
        pairs = []
        for name, p3, d in records:
            if row in FLAT_ROWS and d.get("noise_flag"):
                continue
            v = d.get(row) if row == "star_load_seconds" else d["queries"].get(row)
            if v is None:
                continue
            if row in FLAT_ROWS and not _inside_committed(row, v, p3):
                lines.append(
                    f"# EXCLUDED from {row} fit: {name} value {v:.3f} at "
                    f"probe {p3:.1f} — outside the committed flat band "
                    "(trim; see module docstring)"
                )
                continue
            pairs.append((p3 / 100.0, v))
        xs, ys = zip(*pairs)
        a, b, sigma, r2 = ols(list(xs), list(ys))
        n = len(ys)
        mean = sum(ys) / n
        fsig = math.sqrt(sum((y - mean) ** 2 for y in ys) / (n - 1))
        if row in FLAT_ROWS:
            flat[row] = {"mean": round(mean, 3), "sigma": round(fsig, 3)}
            lines.append(
                f"# {row}: flat {mean:.3f} +/- 2*{fsig:.3f} (n={n}, ols R2 {r2:.2f})"
            )
        else:
            fits[row] = {"a": round(a, 3), "b": round(b, 3), "sigma": round(sigma, 3)}
            lines.append(
                f"# {row}: {a:.3f} + {b:.3f}*p, sigma {sigma:.3f}, R2 {r2:.2f} (n={n})"
            )
    return fits, flat, (round(min(p3s), 1), round(max(p3s), 1)), lines


def main() -> None:
    fits, flat, probe_range, lines = refit()
    for ln in lines:
        print(ln)
    print("\nFITS =", json.dumps(fits, indent=1))
    print("FLAT =", json.dumps(flat, indent=1))
    print(f"PROBE_RANGE_MS = ({probe_range[0]:.1f}, {probe_range[1]:.1f})")
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
