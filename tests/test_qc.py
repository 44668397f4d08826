"""QC report (the reference's match-rate map / completeness tracker,
`data_processing/split_geojson.py:214-249` + `data_tracker.py:14-70`):
exact-integer summary invariants and the rendered markdown artifact."""

import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def summary(ray_session):
    from prclz_ray.queries import q_qc_report

    return q_qc_report(SF)


def _vals(summary):
    return {
        (s, m): v
        for s, m, v in zip(
            summary.column("section").to_pylist(),
            summary.column("metric").to_pylist(),
            summary.column("value").to_pylist(),
        )
    }


def test_qc_summary_invariants(summary):
    v = _vals(summary)
    total = v[("coverage", "n_pages_total")]
    geo = v[("coverage", "n_pages_geo")]
    assert total == geo + v[("coverage", "n_pages_no_geo")]
    assert v[("coverage", "geo_ppm")] == geo * 1_000_000 // total
    assert 0 < v[("coverage", "n_gadm_nonzero")] <= 100
    n_docs = v[("dedup", "n_docs")]
    assert n_docs == 500  # sf0.001 documents table
    assert 0 < v[("dedup", "n_unique_text")] <= n_docs
    assert v[("quality", "n_pass")] <= n_docs
    # language mix partitions the corpus
    lang_total = sum(val for (s, _), val in v.items() if s == "lang")
    assert lang_total == n_docs
    # every value is a non-negative exact integer
    assert all(isinstance(val, int) and val >= 0 for val in v.values())


def test_qc_report_artifact_roundtrip(ray_session, summary, tmp_path):
    from prclz_ray.pipelines.qc import render_qc_report, run_qc_report

    out = run_qc_report(SF, str(tmp_path / "qc"))
    assert sorted(out["artifacts"]) == [
        "QC_REPORT.md",
        "qc_per_gadm.parquet",
        "qc_summary.parquet",
    ]
    md = open(tmp_path / "qc" / "QC_REPORT.md").read()
    for section in ("## Coverage", "## Dedup", "## Quality gate", "## Language mix"):
        assert section in md
    # the ascii density map is a 10x10 block inside a code fence
    fence = md.split("```")[1].strip("\n").split("\n")
    assert len(fence) == 10 and all(len(r) == 10 for r in fence)

    # parquet artifacts round-trip and the summary matches the query
    disk = pq.read_table(tmp_path / "qc" / "qc_summary.parquet")
    assert disk.equals(summary)
    per_gadm = pq.read_table(tmp_path / "qc" / "qc_per_gadm.parquet")
    assert per_gadm.num_rows == 101  # 10x10 grid + sentinel

    # renderer is deterministic on the same inputs
    assert render_qc_report(disk, per_gadm, SF) == render_qc_report(
        disk, per_gadm, SF
    )
    # atomic write: no tmp droppings
    assert not [f for f in os.listdir(tmp_path / "qc") if f.startswith(".")]


def test_img2_zero_area_blob_rejected():
    """A width=0 (or height=0) IMG2 blob passes the pixel-count check
    (0 == 0*h) but would corrupt the reduceat offsets downstream —
    the decoder must reject it loudly."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from prclz_ray.stages.media import MAGIC2, _decode_batch_pixels

    blob = MAGIC2 + (0).to_bytes(2, "big") + (5).to_bytes(2, "big")  # w=0,h=5
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "media": pa.array([blob], pa.large_binary()),
        }
    )
    with _pytest.raises(ValueError, match="zero-area"):
        _decode_batch_pixels(batch)


def test_qc_trend_ledger_and_delta_table(ray_session, tmp_path):
    """Two consecutive qc runs into the same out_dir produce the
    progress-over-time delta table (the data_tracker analogue); the
    first run has no trend section (a snapshot is not a trend)."""
    import json

    from prclz_ray.pipelines.qc import run_qc_report

    out_dir = tmp_path / "qc"
    r1 = run_qc_report(SF, str(out_dir))
    md1 = open(out_dir / "QC_REPORT.md").read()
    assert r1["n_runs"] == 1
    assert "## Progress over time" not in md1

    r2 = run_qc_report(SF, str(out_dir))
    md2 = open(out_dir / "QC_REPORT.md").read()
    assert r2["n_runs"] == 2
    assert "## Progress over time" in md2
    # same corpus twice → every delta is +0
    trend = md2.split("## Progress over time", 1)[1]
    assert "(+0)" in trend
    assert trend.count("| 20") == 2  # one ledger row per run

    # the ledger is machine-readable jsonl, one record per run
    lines = open(out_dir / "_manifest" / "_runs.jsonl").read().splitlines()
    recs = [json.loads(x) for x in lines]
    assert len(recs) == 2 and all(r["job"] == "qc" for r in recs)
    assert recs[0]["metrics"] == recs[1]["metrics"]


def test_qc_trend_ledger_isolates_corpora(tmp_path):
    """One out_dir can host qc runs of several inputs; the trend
    history must only compare runs over the SAME corpus (a delta
    between different inputs is not progress)."""
    import json

    from prclz_ray.pipelines.qc import _read_qc_runs

    led = tmp_path / "_manifest"
    led.mkdir()
    recs = [
        {"job": "qc", "input": "/data/sfA", "ts": 1.0, "metrics": {"m": 1}},
        {"job": "qc", "input": "/data/sfB", "ts": 2.0, "metrics": {"m": 9}},
        {"job": "qc", "input": "/data/sfA/", "ts": 3.0, "metrics": {"m": 2}},
        {"job": "tiles", "input": "/data/sfA", "ts": 4.0, "metrics": {}},
    ]
    with open(led / "_runs.jsonl", "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")

    a = _read_qc_runs(str(tmp_path), input_dir="/data/sfA")
    assert [r["ts"] for r in a] == [1.0, 3.0]  # path-normalized match
    b = _read_qc_runs(str(tmp_path), input_dir="/data/sfB")
    assert [r["ts"] for r in b] == [2.0]
    # no filter → all qc rows (back-compat for ad-hoc inspection)
    assert len(_read_qc_runs(str(tmp_path))) == 3


def test_qc_trend_renderer_deltas():
    """Pure renderer: deltas are vs the PREVIOUS run, signed, and
    missing metrics render as an em-dash instead of crashing."""
    from prclz_ray.pipelines.qc import render_qc_trend

    h = [
        {"ts": 1e9, "metrics": {"coverage.n_pages_total": 100,
                                "coverage.n_pages_geo": 90,
                                "dedup.n_unique_text": 80,
                                "quality.n_pass": 70}},
        {"ts": 1e9 + 86400, "metrics": {"coverage.n_pages_total": 150,
                                        "coverage.n_pages_geo": 85,
                                        "quality.n_pass": 70}},
    ]
    md = render_qc_trend(h)
    assert "(+50)" in md and "(-5)" in md and "(+0)" in md and "—" in md
    assert render_qc_trend(h[:1]) == ""
