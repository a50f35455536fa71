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
job_latency_ms_{start,warm,end}, over the 14 committed probe-carrying
records (BENCH_r12-r15 + the ten r12-r15 bench_snapshots); refit via
tools/refit_bands.py when new probe-carrying records land.
graph_louvain is probe-independent (R² ≤ 0.16 under every regressor
tried) and uses a flat empirical mean ± 2σ band instead, fitted on
the 12 flag-null records only (see refit_bands.py: a flat band has no
regressor to absorb a flagged record's weather). On trace-carrying
records louvain is additionally TRACE-CONDITIONED (r15 verdict ask):
~5 of 23 r15 hunts read louvain outside its flat band and every miss
traced post-hoc to a row-local loud episode, so an outside reading
whose bracketing job_probe_trace_ms weather is loud (≥ 150 ms) is
adjudicated as weather in place, not flagged for investigation.
"""
import json
import sys
from pathlib import Path

# value_s = a + b * (probe_mean3 / 100 ms); band = fit ± 2*sigma.
# Fitted 2026-08-16 (r16, tools/refit_bands.py) on n=14 records,
# probe range 94-136 ms.
FITS = {
    "graph_connected_components": {"a": 1.312, "b": 3.020, "sigma": 0.359},
    "graph_pagerank": {"a": -0.648, "b": 3.501, "sigma": 0.414},
    "star_load_seconds": {"a": 3.275, "b": 4.281, "sigma": 0.394},
    "llm_semdedup": {"a": 2.257, "b": 1.734, "sigma": 0.454},
}
# Probe-independent: flat band = mean ± 2σ of the 12 flag-null records.
FLAT = {"graph_louvain": {"mean": 6.986, "sigma": 0.701}}
PROBE_RANGE_MS = (94.0, 136.0)
# A trace sample at/above this is a row-local loud episode (r15 hunt
# log: episodes read 212-633 ms vs a 118-144 ms ordinary-band floor).
TRACE_LOUD_MS = 150.0


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

    Alignment is self-describing from r16 on: bench.py records
    `job_probe_trace_rows` (the row name per sample slot) next to the
    trace, so pairing no longer rests on the implicit "both sides sort
    alphabetically" cross-file convention (r15 ADVICE). Pre-r16 sidecars
    lack the field and fall back to the sorted(queries) convention the
    unit test pins.

    Returns None when the record carries no trace, the trace length does
    not match len(rows)+1, or a recorded row list disagrees with the
    queries dict (misalignment would silently pair rows with the wrong
    samples).
    """
    trace = payload.get("job_probe_trace_ms")
    queries = payload.get("queries")
    if not trace or not queries:
        return None
    rows = payload.get("job_probe_trace_rows") or sorted(queries)
    if len(trace) != len(rows) + 1 or set(rows) != set(queries):
        return None
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
    weather = row_weather(payload)
    for row, f in FLAT.items():
        v = queries.get(row)
        if v is None:
            continue
        lo, hi = f["mean"] - 2 * f["sigma"], f["mean"] + 2 * f["sigma"]
        if lo <= v <= hi:
            verdict = "inside"
        elif weather and row in weather and weather[row] >= TRACE_LOUD_MS:
            # Trace-conditioned adjudication (r15 verdict ask): every
            # r15 outside-louvain hunt traced to a row-local loud
            # episode; when the record itself shows one under this row,
            # the miss is weather, adjudicated in place — not flagged.
            verdict = (
                f"outside, but local weather {weather[row]:.0f} ms ≥ "
                f"{TRACE_LOUD_MS:.0f} — traced row-local loud episode, "
                "adjudicated as weather"
            )
        elif weather and row in weather:
            verdict = f"local weather {weather[row]:.0f} ms quiet — OUTSIDE"
        else:
            verdict = "OUTSIDE"
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
