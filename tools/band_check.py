"""Evaluate a bench sidecar against the probe-conditioned expected bands.

The r14 verdict asked for fitted per-row expected bands (row value vs
the record's own dispatch probes) so ordinary-band records are
quantitatively adjudicable without waiting for a quiet-band minute.
The fit lives in bench_snapshots/README.md ("Probe-conditioned expected
bands"); this tool applies it to a record so snapshot notes can cite
computed verdicts instead of hand arithmetic.

Usage:
    python tools/band_check.py [path-to-sidecar.json ...]

Defaults to the live BENCH_local.json at the repo root. Prints one
line per job-count-heavy row: fitted expectation at the record's
probe_mean3, the ±2σ band, and inside/outside. Exit code is 0 either
way — the band is an adjudication aid, not a gate.

Fit provenance: OLS of row value on probe_mean3 = mean of
job_latency_ms_{start,warm,end}, over the 10 committed probe-carrying
records (BENCH_r12-r14 + the seven r12-r14 bench_snapshots); refit via
the snippet in the README section when new quiet-band records land.
graph_louvain is probe-independent (R² ≤ 0.05 under every regressor
tried) and uses a flat empirical mean ± 2σ band instead.
"""
import json
import sys
from pathlib import Path

# value_s = a + b * (probe_mean3 / 100 ms); band = fit ± 2*sigma.
# Fitted 2026-08-15 (r15) on n=10 records, probe range 94-136 ms.
FITS = {
    "graph_connected_components": {"a": 1.288, "b": 3.046, "sigma": 0.391},
    "graph_pagerank": {"a": -1.369, "b": 4.050, "sigma": 0.411},
    "star_load_seconds": {"a": 3.737, "b": 3.862, "sigma": 0.396},
    "llm_semdedup": {"a": 2.822, "b": 1.247, "sigma": 0.504},
}
# Probe-independent: flat band = mean ± 2σ of the same 10 records.
FLAT = {"graph_louvain": {"mean": 6.977, "sigma": 0.789}}
PROBE_RANGE_MS = (94.0, 136.0)


def outside_rows(payload: dict) -> list[str] | None:
    """Structured verdict: names of rows OUTSIDE their fitted band.

    Returns None when the bands are inapplicable to this record (wrong
    sf, no probes), [] when every covered row reads inside, else the
    sorted row names. This is what bench.py embeds in the compact
    stdout payload as `band_outside`.
    """
    lines = check(payload)
    if any("inapplicable" in ln for ln in lines):
        return None
    return sorted(ln.split(":")[0] for ln in lines if ln.endswith("OUTSIDE"))


def row_weather(payload: dict) -> dict[str, float] | None:
    """Per-row local dispatch weather from the sidecar's probe trace.

    bench.py (r15) records `job_probe_trace_ms`: one single-rep probe
    between suite rows — sample i precedes sorted(queries)[i], the last
    sample follows the final row. A row's local weather is the mean of
    its two bracketing samples, which is what the three suite-level
    probes cannot give: every band miss in the r15 hunt log traced to a
    loud episode localized WITHIN the suite that probe_mean3 straddled.
    Single samples jitter (~±30 ms on scheduler wakeup), so treat a
    row's number as indicative, not calibrated — the fitted bands stay
    keyed on probe_mean3 until enough trace-carrying records exist to
    refit row-locally.

    Returns None when the record carries no trace or the trace length
    does not match len(queries)+1 (misalignment would silently pair
    rows with the wrong samples).
    """
    trace = payload.get("job_probe_trace_ms")
    queries = payload.get("queries")
    if not trace or not queries or len(trace) != len(queries) + 1:
        return None
    rows = sorted(queries)
    return {
        row: round((trace[i] + trace[i + 1]) / 2, 1) for i, row in enumerate(rows)
    }


def check(payload: dict) -> list[str]:
    sf = payload.get("sf")
    if sf != 0.1:
        # Every record in the fitting data ran at sf0.1; row values at
        # another scale factor have nothing to do with these bands
        # (caught live: an sf0.001 smoke run read every row OUTSIDE).
        return [f"bands fitted at sf0.1 — inapplicable at sf={sf}"]
    probes = [
        payload.get("job_latency_ms_start"),
        payload.get("job_latency_ms_warm"),
        payload.get("job_latency_ms_end"),
    ]
    if any(p is None for p in probes):
        return ["no job_latency_ms_* probes on this record — bands inapplicable"]
    p3 = sum(probes) / 3
    lines = [
        f"probe_mean3 = {p3:.1f} ms (start/warm/end ="
        f" {probes[0]:.0f}/{probes[1]:.0f}/{probes[2]:.0f});"
        f" dispatch_band = {payload.get('dispatch_band')}"
    ]
    if not (PROBE_RANGE_MS[0] <= p3 <= PROBE_RANGE_MS[1]):
        lines.append(
            f"NOTE: probe_mean3 outside the fitted {PROBE_RANGE_MS[0]:.0f}-"
            f"{PROBE_RANGE_MS[1]:.0f} ms range — extrapolating"
        )
    queries = payload.get("queries", {})
    for row, f in FITS.items():
        v = payload.get(row) if row == "star_load_seconds" else queries.get(row)
        if v is None:
            continue
        exp = f["a"] + f["b"] * p3 / 100.0
        lo, hi = exp - 2 * f["sigma"], exp + 2 * f["sigma"]
        verdict = "inside" if lo <= v <= hi else "OUTSIDE"
        lines.append(
            f"{row}: {v:.3f} s vs fitted {exp:.2f} [{lo:.2f}-{hi:.2f}] — {verdict}"
        )
    for row, f in FLAT.items():
        v = queries.get(row)
        if v is None:
            continue
        lo, hi = f["mean"] - 2 * f["sigma"], f["mean"] + 2 * f["sigma"]
        verdict = "inside" if lo <= v <= hi else "OUTSIDE"
        lines.append(
            f"{row}: {v:.3f} s vs flat band [{lo:.2f}-{hi:.2f}]"
            f" (probe-independent) — {verdict}"
        )
    return lines


def main(paths: list[str]) -> None:
    for path in paths:
        payload = json.loads(Path(path).read_text())
        if "queries" not in payload and isinstance(payload.get("parsed"), dict):
            payload = payload["parsed"]  # driver BENCH_r*.json nesting
        print(f"== {path}")
        for line in check(payload):
            print(f"   {line}")
        weather = row_weather(payload)
        if weather:
            heavy = [r for r in (*FITS, *FLAT) if r in weather]
            if heavy:
                print(
                    "   row-local weather (trace, single-rep samples): "
                    + ", ".join(f"{r} {weather[r]:.0f}ms" for r in heavy)
                )


if __name__ == "__main__":
    args = sys.argv[1:] or [str(Path(__file__).resolve().parents[1] / "BENCH_local.json")]
    main(args)
