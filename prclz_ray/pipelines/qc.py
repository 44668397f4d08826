"""Human-facing QC report — the engine's counterpart of the
reference's match-rate maps and completeness tracker
(``data_processing/split_geojson.py:214-249`` renders per-district
match-rate choropleths; ``data_processing/data_tracker.py:14-70``
tabulates per-country progress).  Here the same content is one small
markdown artifact + two parquet tables:

- ``qc_summary.parquet`` — the (section, metric, value) table of
  ``queries.q_qc_report`` (oracle-checked: every value is an exact
  integer the DuckDB gate hashes bit-for-bit);
- ``qc_per_gadm.parquet`` — the 101-row per-admin-cell page counts
  (zero-filled grid + no-geo sentinel, A3 semantics);
- ``QC_REPORT.md`` — rendered sections plus an ASCII density map of
  the admin grid (the choropleth stand-in: no plotting libs in the
  engine's environment, and a text artifact diffs cleanly in review).

Everything here is driver-side formatting of already-tiny rollup
results — the distributed work happened inside the oracle-checked
queries this composes.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from .. import world

# density glyphs, lightest→densest (quantile-free: fixed fractions of
# the max cell count, so two runs over the same corpus render the same)
_GLYPHS = " .:-=+*#%@"


def _ascii_density_map(per_gadm: pa.Table) -> str:
    """10×10 admin-grid density map, row gy descending (north up)."""
    n_axis = world.N_GADM_AXIS  # the one published grid-axis constant
    counts = dict(
        zip(
            per_gadm.column("gadm_key").to_pylist(),
            per_gadm.column("n_pages").to_pylist(),
        )
    )
    peak = max(
        (v for k, v in counts.items() if k != world.SENTINEL_GADM), default=0
    )
    lines = []
    for gy in range(n_axis - 1, -1, -1):
        row = []
        for gx in range(n_axis):
            v = counts.get(world.gadm_id_str(gx, gy), 0)
            if peak <= 0 or v <= 0:
                row.append(_GLYPHS[0] if v <= 0 else _GLYPHS[1])
            else:
                row.append(_GLYPHS[min(len(_GLYPHS) - 1, 1 + v * (len(_GLYPHS) - 2) // peak)])
        lines.append("".join(row))
    return "\n".join(lines)


def render_qc_report(summary: pa.Table, per_gadm: pa.Table, sf_dir: str) -> str:
    """Markdown QC report from the two rollup tables (pure driver-side
    string work — both inputs are ≤ ~101 rows by construction)."""
    vals = {
        (s, m): v
        for s, m, v in zip(
            summary.column("section").to_pylist(),
            summary.column("metric").to_pylist(),
            summary.column("value").to_pylist(),
        )
    }

    def pct(ppm_key: tuple[str, str]) -> str:
        return f"{vals[ppm_key] / 10_000:.2f}%"

    out = [f"# QC report — `{sf_dir}`", ""]
    out += [
        "## Coverage",
        "",
        "| metric | value |",
        "|---|---|",
        f"| pages total | {vals[('coverage', 'n_pages_total')]:,} |",
        f"| pages with geo | {vals[('coverage', 'n_pages_geo')]:,} "
        f"({pct(('coverage', 'geo_ppm'))}) |",
        f"| pages without geo (sentinel) | {vals[('coverage', 'n_pages_no_geo')]:,} |",
        f"| admin cells with pages | {vals[('coverage', 'n_gadm_nonzero')]} |",
        "",
        "Page density by admin cell (north up, ` `=0 → `@`=peak):",
        "",
        "```",
        _ascii_density_map(per_gadm),
        "```",
        "",
    ]
    out += [
        "## Dedup",
        "",
        "| metric | value |",
        "|---|---|",
        f"| documents | {vals[('dedup', 'n_docs')]:,} |",
        f"| unique texts | {vals[('dedup', 'n_unique_text')]:,} |",
        f"| duplicate rate | {pct(('dedup', 'dup_ppm'))} |",
        "",
        "## Quality gate",
        "",
        "| metric | value |",
        "|---|---|",
        f"| documents passing | {vals[('quality', 'n_pass')]:,} "
        f"({pct(('quality', 'pass_ppm'))}) |",
        "",
        "## Language mix",
        "",
        "| language | pages |",
        "|---|---|",
    ]
    for (s, m), v in sorted(vals.items()):
        if s == "lang":
            out.append(f"| {m.removeprefix('n_lang_')} | {v:,} |")
    out += [
        "",
        "## Block complexity (k)",
        "",
        "| k | blocks |",
        "|---|---|",
    ]
    # numeric sort: lexicographic would render k=10 before k=2
    krows = sorted(
        (int(m.removeprefix("n_blocks_k")), v)
        for (s, m), v in vals.items()
        if s == "complexity"
    )
    out += [f"| {k} | {v:,} |" for k, v in krows]
    out.append("")
    return "\n".join(out)


# headline metrics tracked run-over-run (the data_tracker.py:14-70
# analogue: the reference tabulates per-country complexity-coverage
# progress across sessions; here the same progress ledger is per
# qc-run over the corpus)
_TREND_KEYS = [
    ("coverage", "n_pages_total"),
    ("coverage", "n_pages_geo"),
    ("dedup", "n_unique_text"),
    ("quality", "n_pass"),
]


def _read_qc_runs(out_dir: str, input_dir: str | None = None) -> list[dict]:
    """The qc-job rows of the shared ``_runs.jsonl`` ledger (appends
    go through ``flagship._write_run_metrics`` — ONE owner of the
    ledger path and record envelope). Driver-side bytes only.

    When ``input_dir`` is given, only runs over that SAME corpus are
    returned — one out_dir can host qc runs of several inputs, and a
    delta between different corpora is not progress."""
    import json

    path = os.path.join(out_dir, "_manifest", "_runs.jsonl")
    want = os.path.abspath(input_dir) if input_dir else None
    history: list[dict] = []
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue  # a torn tail line from a killed run
                if row.get("job") != "qc":
                    continue
                if want and os.path.abspath(row.get("input", "")) != want:
                    continue
                history.append(row)
    return history


def render_qc_trend(history: list[dict]) -> str:
    """Progress-over-time section: one row per qc run, headline
    metrics + delta vs the previous run. Empty string until a second
    run exists (a single snapshot has no trend)."""
    if len(history) < 2:
        return ""
    import datetime

    out = [
        "## Progress over time",
        "",
        "| run | " + " | ".join(m for _, m in _TREND_KEYS) + " |",
        "|---|" + "---|" * len(_TREND_KEYS),
    ]
    prev = None
    for rec in history:
        when = datetime.datetime.fromtimestamp(rec["ts"]).strftime(
            "%Y-%m-%d %H:%M"
        )
        cells = []
        for s, m in _TREND_KEYS:
            v = rec["metrics"].get(f"{s}.{m}")
            if v is None:
                cells.append("—")
                continue
            cell = f"{v:,}"
            if prev is not None:
                pv = prev["metrics"].get(f"{s}.{m}")
                if pv is not None:
                    d = v - pv
                    cell += f" ({'+' if d >= 0 else ''}{d:,})"
            cells.append(cell)
        out.append(f"| {when} | " + " | ".join(cells) + " |")
        prev = rec
    out.append("")
    return "\n".join(out)


def run_qc_report(sf_dir: str, out_dir: str) -> dict:
    """Compute + render the QC artifact set into ``out_dir`` (atomic
    per-file via same-dir tmp + rename, so a killed run never leaves a
    half-written report). Appends this run's summary to the
    ``_runs.jsonl`` ledger; from the second run on, the report carries
    a progress-over-time delta table. Returns a small manifest dict."""
    from ..queries import _qc_tables

    os.makedirs(out_dir, exist_ok=True)
    # one joined-pipeline run yields both tables (the summary is
    # derived from the per-gadm rollup — never compute it twice)
    summary, per_gadm = _qc_tables(sf_dir)
    md = render_qc_report(summary, per_gadm, sf_dir)
    import time as _time

    metrics = {
        f"{s}.{m}": v
        for s, m, v in zip(
            summary.column("section").to_pylist(),
            summary.column("metric").to_pylist(),
            summary.column("value").to_pylist(),
        )
    }
    rec = {"job": "qc", "input": sf_dir, "ts": _time.time(), "metrics": metrics}
    history = _read_qc_runs(out_dir, input_dir=sf_dir) + [rec]
    trend = render_qc_trend(history)
    if trend:
        md = md + "\n" + trend

    artifacts = {}
    for name, writer in (
        ("qc_summary.parquet", lambda p: pq.write_table(summary, p)),
        ("qc_per_gadm.parquet", lambda p: pq.write_table(per_gadm, p)),
        ("QC_REPORT.md", lambda p: open(p, "w").write(md)),
    ):
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=f".{name}.")
        os.close(fd)
        writer(tmp)
        final = os.path.join(out_dir, name)
        os.replace(tmp, final)
        artifacts[name] = final
    # ledger append LAST — a run killed mid-artifact-write must not be
    # recorded as completed (phantom trend rows otherwise); the shared
    # flagship helper owns the path + envelope
    from .flagship import _write_run_metrics

    _write_run_metrics(out_dir, "qc", sf_dir, {"metrics": metrics})
    return {
        "out_dir": out_dir,
        "n_summary_rows": summary.num_rows,
        "n_gadm_rows": per_gadm.num_rows,
        "n_runs": len(history),
        "artifacts": sorted(artifacts),
    }
