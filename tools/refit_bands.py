"""Refit the weather-conditioned expected bands from the committed records.

The fit consumed by tools/band_check.py (FITS / FITS_P3_FALLBACK /
FLAT / TM_RANGE_MS / PROBE_RANGE_MS) and documented in
bench_snapshots/README.md is reproduced by running this script — it
enumerates every COMMITTED record that carries job_latency_ms_* probes
(git-tracked BENCH_r*.json + bench_snapshots/*.json; r16 ADVICE:
globbing the working tree silently included untracked files, so two
operators could get different fits from the same commit — untracked
probe-carrying files are warned about and skipped, and locally
MODIFIED tracked records are warned about too (r17 ADVICE: tracking
was checked by filename but content read from the working tree, so an
edited tracked record silently changed the fit; the warning restores
the "fit is a function of the commit" claim — commit or restore the
file before trusting a refit that prints it)), fits
value_s = a + b * (x / 100 ms) by ordinary least squares, and prints
the band_check constants plus the README markdown table.

Regressor per row (r18 re-base, trigger set in r17: "re-base the
query-row bands on trace_median once >=10 committed records carry
it" — BENCH_r17 was the 10th):

- graph_connected_components / graph_pagerank / llm_semdedup regress
  on `job_probe_trace_median_ms` (the median of the per-row dispatch
  trace bench.py records between suite rows). At the n=10 trigger
  evaluation the trace median lifted R² decisively over probe_mean3
  (CC 0.55->0.75, pagerank 0.37->0.68, semdedup 0.41->0.64 — three
  endpoint probes straddle mid-suite weather; ~27 inter-row samples
  measure it). Only trace-median-carrying records enter these fits.
- star_load_seconds stays on probe_mean3 (R² 0.91 vs 0.73 on the
  same subset): the loader runs between the start and warm probes,
  BEFORE the trace begins, so the trace median is the wrong window
  for it. All probe-carrying records enter this fit.
- The same three query rows are ALSO fitted on probe_mean3 over all
  probe-carrying records (FITS_P3_FALLBACK) so band_check can still
  read pre-trace records (BENCH_r12-r14, the r12-r15 snapshots).
- graph_louvain stays probe-independent FLAT (see below): on the
  trace subset its tm fit reaches R² 0.63 only AFTER the flat trim
  at n=7 (all-readings tm OLS: sigma 1.85 — the 12.2 s episode
  readings are row-local, not session-weather), too weak to adopt.
  Candidate for a future re-base at >=10 flag-null in-band
  tm-carrying readings.

Flat-row trimming (r16 ADVICE): a FLAT-row reading that the COMMITTED
band_check constants do not read "inside" is excluded from the refit
and printed as an exclusion — a flat band has no regressor to absorb
weather, so fitting on episode readings teaches the band to accept the
very weather it exists to flag (observed live: the two 12.2 s louvain
episode readings took the flat band from 6.99±2*0.70 to 7.67±2*1.93
when included). OLS rows deliberately keep ALL records, outliers and
flagged included — their regressor is the weather absorber, their
sigma should reflect honest residuals, and check-time trace
adjudication (band_check.py) handles the episode-miss case the fit
cannot. The committed constants are therefore a FIXED POINT of this
script: refitting at HEAD reproduces them exactly
(tests/test_harness_guards.py pins this), and adopting a genuinely
shifted flat population — e.g. after a code change or on a first
quiet-band record — is a deliberate re-base: run the script, review
the printed exclusions, paste the new constants, re-run until stable,
and document the move in bench_snapshots/README.md.

Drift surfacing (r17 ADVICE): because the trim can only reproduce or
shrink a flat band, systematic drift would otherwise be trimmed
silently forever; the refit now prints, per flat row, how many of the
last RECENT_WINDOW flag-null readings were trimmed and recommends a
deliberate re-base when >= RECENT_TRIM_ALERT of them were.

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

# Regressor per OLS row: "trace_median" (job_probe_trace_median_ms) or
# "probe_mean3" (mean of the three suite-level job_latency_ms probes).
XSPEC = {
    "graph_connected_components": "trace_median",
    "graph_pagerank": "trace_median",
    "llm_semdedup": "trace_median",
    "star_load_seconds": "probe_mean3",
}
# r20 re-base (VERDICT r19 item 3): the five banded rows' execution
# changed in the r19/r20 optimization rounds (single-task kernels, then
# the r20 fused pair feeds / loader gate), so pre-r20 readings describe
# RETIRED plans. Records from rounds before a row's epoch are excluded
# from that row's fit (the filename round number — BENCH_r{N} /
# r{N}_*.json — is the population key the chronological sort already
# parses). semdedup's kernel is r19 code unchanged in r20, but only the
# r20 records are unambiguously post-optimization (the r19-named
# snapshots mix pre/post states), so all five rows re-base on r20+.
EPOCH_MIN_ROUND = {
    "graph_connected_components": 20,
    "graph_pagerank": 20,
    "llm_semdedup": 20,
    "star_load_seconds": 20,
    "graph_louvain": 20,
}
# graph_louvain stays probe-independent: flat mean +/- 2 sigma, fitted
# on FLAG-NULL records only (an OLS row has its regressor to absorb a
# flagged record's weather, a flat band does not), with the committed-
# band trim documented above.
FLAT_ROWS = {"graph_louvain"}
ROWS = list(XSPEC) + sorted(FLAT_ROWS)
# Rows that get a probe_mean3 fallback fit for pre-trace records.
FALLBACK_ROWS = [r for r, x in XSPEC.items() if x == "trace_median"]
# Flat-drift alert (r17 ADVICE): warn when this many of the last
# RECENT_WINDOW flag-null readings for a flat row were trimmed.
RECENT_WINDOW = 5
RECENT_TRIM_ALERT = 2


def load_records(warnings: list[str] | None = None) -> list[tuple[str, float, float | None, dict]]:
    """(name, probe_mean3, trace_median|None, payload) for committed records.

    Enumerates via `git ls-files` so the fit is a function of the
    commit, not the working tree; probe-carrying files matching the
    record globs but NOT tracked are reported in `warnings`, and
    tracked-but-locally-modified records are warned about (content is
    still read from the working tree — restore or commit before
    trusting the refit).
    """
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "BENCH_r*.json", "bench_snapshots/*.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    # `git diff --name-only -z HEAD` = tracked files whose working-tree
    # content differs from the commit (staged or not), NUL-delimited so
    # renamed and non-ASCII paths arrive verbatim (r18 ADVICE: parsing
    # `status --porcelain` with line[3:] yielded 'old -> new' for
    # renames and a core.quotePath-quoted string for non-ASCII names,
    # which silently evaded this warning).
    modified = {
        p for p in subprocess.run(
            ["git", "diff", "--name-only", "-z", "HEAD", "--",
             "BENCH_r*.json", "bench_snapshots/*.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split("\0")
        if p
    }
    # Chronological order, not filename order (r18 ADVICE: sorting all
    # BENCH_r*.json before all snapshots meant a driver record's trims
    # could never reach the flat-drift "recent" window). Within a round
    # the driver record lands LAST — it is recorded at round end, after
    # the builder session's snapshots — so the key is (round, is_driver,
    # name); the name tiebreak keeps same-round snapshots stable.
    def _chrono_key(f: Path) -> tuple[int, int, str]:
        import re

        m = re.match(r"(?:BENCH_)?r(\d+)", f.name)
        rnd = int(m.group(1)) if m else 0
        return (rnd, f.name.startswith("BENCH_"), f.name)

    candidates = sorted(
        list(REPO.glob("BENCH_r*.json"))
        + list((REPO / "bench_snapshots").glob("*.json")),
        key=_chrono_key,
    )
    out = []
    for f in candidates:
        d = json.loads(f.read_text())
        # r20: the driver also records a LOW-core-count bench
        # (BENCH_r19_c8 was the first); its row values are structurally
        # different (dispatch-bound rows speed UP on fewer cores), so a
        # record whose wrapper declares cpus != 32 never enters the fit.
        cpus = d.get("cpus")
        if cpus is not None and cpus != 32:
            if warnings is not None:
                warnings.append(
                    f"# SKIPPED record {f.name}: cpus={cpus} (fits "
                    "describe the 32-core bench)"
                )
            continue
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
        if rel in modified and warnings is not None:
            warnings.append(
                f"WARNING: tracked record {rel} is locally modified — the "
                "fit reads working-tree content; restore or commit it so "
                "the fit is a function of the commit"
            )
        tm = d.get("job_probe_trace_median_ms")
        if tm is None and d.get("job_probe_trace_ms"):
            import statistics
            tm = statistics.median(d["job_probe_trace_ms"])
        out.append((f.name, sum(probes) / 3, tm, d))
    return out


def _round_of(name: str) -> int:
    """Round number encoded in a record filename (BENCH_r{N}.json /
    r{N}_*.json) — the population key for EPOCH_MIN_ROUND."""
    import re

    m = re.match(r"(?:BENCH_)?r(\d+)", name)
    return int(m.group(1)) if m else 0


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


def _inside_committed(row: str, value: float, p3: float, tm: float | None) -> bool:
    """Does the COMMITTED band read this reading inside?

    Mirrors band_check.check(): a trace_median-keyed fit evaluated on a
    trace-less record falls back to the row's FITS_P3_FALLBACK
    probe_mean3 fit (r18 ADVICE: evaluating tm coefficients at a
    probe_mean3 value would misclassify pre-trace records if OLS-row
    trimming is ever enabled; currently only FLAT rows reach the OLS
    branch via the louvain-re-base candidate path).
    """
    if row in band_check.FLAT:
        f = band_check.FLAT[row]
        return abs(value - f["mean"]) <= 2 * f["sigma"]
    f = band_check.FITS[row]
    if f["x"] == "trace_median" and tm is None:
        f = band_check.FITS_P3_FALLBACK[row]
        x = p3
    else:
        x = tm if f["x"] == "trace_median" else p3
    exp = f["a"] + f["b"] * x / 100.0
    return abs(value - exp) <= 2 * f["sigma"]


def _row_value(row: str, d: dict) -> float | None:
    return d.get(row) if row == "star_load_seconds" else d["queries"].get(row)


def _fit_row(row: str, pairs: list[tuple[float, float]], lines: list[str],
             n_skipped: int) -> dict | None:
    """OLS-fit one row; guard the degenerate case (r17 ADVICE: zip(*[])
    raised ValueError and ols() divided by zero at n<=2, turning the
    documented re-base workflow into a crash when every reading for a
    row was trimmed/flag-skipped or absent)."""
    if len(pairs) < 3:
        lines.append(
            f"# SKIPPED fit for {row}: only {len(pairs)} usable reading(s) "
            f"after excluding {n_skipped} — need >= 3 for an OLS band; "
            "commit more records or review the exclusions"
        )
        return None
    xs, ys = zip(*pairs)
    a, b, sigma, r2 = ols(list(xs), list(ys))
    lines.append(
        f"# {row}: {a:.3f} + {b:.3f}*x, sigma {sigma:.3f}, R2 {r2:.2f} "
        f"(n={len(ys)})"
    )
    return {"a": round(a, 3), "b": round(b, 3), "sigma": round(sigma, 3)}


def refit() -> tuple[dict, dict, dict, tuple[float, float], tuple[float, float], list[str]]:
    """(FITS, FITS_P3_FALLBACK, FLAT, TM_RANGE_MS, PROBE_RANGE_MS, log lines)."""
    warnings: list[str] = []
    records = load_records(warnings)
    p3s = [p for _, p, _, _ in records]
    tms = [t for _, _, t, _ in records if t is not None]
    lines = list(warnings)
    lines.append(
        f"# n={len(records)} probe-carrying committed records "
        f"({len(tms)} carry a trace median):"
    )
    for n, p, t, _ in records:
        lines.append(
            f"#   {n}: probe_mean3 {p:.1f} ms"
            + (f", trace_median {t:.1f} ms" if t is not None else "")
        )
    lines.append(
        f"# probe_mean3 range {min(p3s):.1f}-{max(p3s):.1f} ms; "
        f"trace_median range {min(tms):.1f}-{max(tms):.1f} ms"
    )

    fits, fallback, flat = {}, {}, {}
    for row, xkind in XSPEC.items():
        pairs, skipped, epoch_dropped = [], 0, 0
        for name, p3, tm, d in records:
            v = _row_value(row, d)
            if v is not None and _round_of(name) < EPOCH_MIN_ROUND.get(row, 0):
                epoch_dropped += 1
                continue
            x = tm if xkind == "trace_median" else p3
            if v is None or x is None:
                skipped += v is not None  # trace-less record for a tm row
                continue
            pairs.append((x / 100.0, v))
        if epoch_dropped:
            lines.append(
                f"# {row}: {epoch_dropped} pre-r{EPOCH_MIN_ROUND[row]} "
                "record(s) excluded (retired-plan population, "
                "EPOCH_MIN_ROUND)"
            )
        f = _fit_row(f"{row} (on {xkind})", pairs, lines, skipped)
        if f is not None:
            fits[row] = {**f, "x": xkind}
    for row in FALLBACK_ROWS:
        pairs = [
            (p3 / 100.0, v) for name, p3, tm, d in records
            if (v := _row_value(row, d)) is not None
            and _round_of(name) >= EPOCH_MIN_ROUND.get(row, 0)
        ]
        f = _fit_row(f"{row} (probe_mean3 fallback)", pairs, lines, 0)
        if f is not None:
            fallback[row] = f
    for row in sorted(FLAT_ROWS):
        pairs, trimmed, flag_null_flags = [], 0, []
        for name, p3, tm, d in records:
            v = _row_value(row, d)
            if v is None:
                continue
            if _round_of(name) < EPOCH_MIN_ROUND.get(row, 0):
                continue
            if d.get("noise_flag"):
                continue
            inside = _inside_committed(row, v, p3, tm)
            flag_null_flags.append(not inside)
            if not inside:
                trimmed += 1
                lines.append(
                    f"# EXCLUDED from {row} fit: {name} value {v:.3f} at "
                    f"probe {p3:.1f} — outside the committed flat band "
                    "(trim; see module docstring)"
                )
                continue
            pairs.append((p3 / 100.0, v))
        if len(pairs) < 3:
            lines.append(
                f"# SKIPPED flat fit for {row}: only {len(pairs)} usable "
                f"reading(s) after trimming {trimmed} — need >= 3; "
                "this is the deliberate re-base case, review exclusions"
            )
            continue
        ys = [v for _, v in pairs]
        n = len(ys)
        mean = sum(ys) / n
        fsig = math.sqrt(sum((y - mean) ** 2 for y in ys) / (n - 1))
        flat[row] = {"mean": round(mean, 3), "sigma": round(fsig, 3)}
        lines.append(f"# {row}: flat {mean:.3f} +/- 2*{fsig:.3f} (n={n})")
        recent = flag_null_flags[-RECENT_WINDOW:]
        n_recent_trim = sum(recent)
        lines.append(
            f"# {row} trim drift: {n_recent_trim} of last {len(recent)} "
            f"flag-null readings trimmed ({trimmed} trimmed overall)"
            + (
                " — CONSIDER RE-BASE: repeated recent trims mean the "
                "population may have shifted; run the deliberate re-base "
                "procedure (module docstring), do not keep trimming"
                if n_recent_trim >= RECENT_TRIM_ALERT else ""
            )
        )
    tm_range = (round(min(tms), 1), round(max(tms), 1)) if tms else (0.0, 0.0)
    p3_range = (round(min(p3s), 1), round(max(p3s), 1))
    return fits, fallback, flat, tm_range, p3_range, lines


def main() -> None:
    fits, fallback, flat, tm_range, p3_range, lines = refit()
    for ln in lines:
        print(ln)
    print("\nFITS =", json.dumps(fits, indent=1))
    print("FITS_P3_FALLBACK =", json.dumps(fallback, indent=1))
    print("FLAT =", json.dumps(flat, indent=1))
    print(f"TM_RANGE_MS = ({tm_range[0]:.1f}, {tm_range[1]:.1f})")
    print(f"PROBE_RANGE_MS = ({p3_range[0]:.1f}, {p3_range[1]:.1f})")
    print("\n# README table rows (@110/130/150/170 ms of each row's regressor):")
    for row, f in fits.items():
        cells = []
        for p in (1.1, 1.3, 1.5, 1.7):
            e = f["a"] + f["b"] * p
            cells.append(f"{e:.2f} [{e - 2 * f['sigma']:.2f}-{e + 2 * f['sigma']:.2f}]")
        print(f"| {row} | {f['x']} | {f['a']:.2f} + {f['b']:.2f}·x | "
              f"{f['sigma']:.2f} | | " + " | ".join(cells) + " |")
    for row, f in flat.items():
        print(f"| {row} | — | probe-independent | {f['sigma']:.2f} | | "
              f"{f['mean']:.2f} ± {2 * f['sigma']:.2f} (flat) | — | — | — |")


if __name__ == "__main__":
    sys.exit(main())
