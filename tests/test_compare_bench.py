"""Calibration-normalized bench comparison (scripts/compare_bench.py —
r9 verdict "Missing #1"): the adjudication that separates host drift from
code regressions must itself be pinned, or the tool that ends manual
adjudication becomes the next thing needing one."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "compare_bench", os.path.join(REPO, "scripts", "compare_bench.py")
)
cb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cb)


def _bench(queries, cpu, scan, total=None):
    return {
        "value": total or sum(queries.values()),
        "queries": queries,
        "calibration": {"cpu_sec": cpu, "scan_sec": scan},
    }


def test_host_drift_is_adjudicated_not_flagged():
    """The r8->r9 episode: unchanged queries 1.5-1.8x slower on a host with
    measured CPU steal. With calibration on both sides the tool must call
    them HOST, not REGRESSION."""
    old = _bench({"q": 0.40, "r": 0.30}, cpu=0.576, scan=0.298)
    # host twice as slow: calibration doubles, queries ~double
    new = _bench({"q": 0.78, "r": 0.60}, cpu=1.114, scan=0.592)
    rep = cb.compare(old, new, threshold=0.15)
    verdicts = {r["query"]: r["verdict"] for r in rep["rows"]}
    assert verdicts == {"q": "HOST", "r": "HOST"}
    assert rep["counts"]["REGRESSION"] == 0


def test_true_regression_survives_normalization():
    """Slower under EVERY host hypothesis => REGRESSION, even when the
    calibration also moved a little."""
    old = _bench({"q": 0.40}, cpu=0.50, scan=0.30)
    new = _bench({"q": 1.20}, cpu=0.55, scan=0.33)  # host only 10% slower
    rep = cb.compare(old, new, threshold=0.15)
    assert rep["rows"][0]["verdict"] == "REGRESSION"


def test_improvement_and_flat():
    old = _bench({"fast": 1.00, "same": 0.50}, cpu=0.50, scan=0.30)
    new = _bench({"fast": 0.40, "same": 0.52}, cpu=0.50, scan=0.30)
    rep = cb.compare(old, new, threshold=0.15)
    verdicts = {r["query"]: r["verdict"] for r in rep["rows"]}
    assert verdicts == {"fast": "IMPROVED", "same": "FLAT"}


def test_missing_calibration_degrades_to_raw():
    """One side without calibration (pre-r9 artifacts, or a null scan
    probe): raw ratios adjudicate alone — no crash, conservative calls."""
    old = {"value": 1.0, "queries": {"q": 0.40}}
    new = _bench({"q": 0.80}, cpu=1.0, scan=None)
    rep = cb.compare(old, new, threshold=0.15)
    assert rep["calibration_ratio"] == {}
    assert rep["rows"][0]["verdict"] == "REGRESSION"  # raw 2x, unexplained


def test_null_scan_probe_uses_cpu_probe_only():
    """bench.py records scan_sec: null when the fixed table is missing
    (r9 ADVICE #4) — the comparison must then normalize by cpu alone."""
    old = _bench({"q": 0.40}, cpu=0.50, scan=None)
    new = _bench({"q": 0.80}, cpu=1.00, scan=0.30)
    rep = cb.compare(old, new, threshold=0.15)
    assert list(rep["calibration_ratio"]) == ["cpu"]
    assert rep["rows"][0]["verdict"] == "HOST"  # fully explained by cpu ratio


def test_cli_unwraps_driver_artifact_shape(tmp_path):
    """The driver's BENCH_r{N}.json nests the bench line under "parsed" —
    the CLI must accept both shapes and exit 0 when nothing regressed."""
    inner_old = _bench({"q": 0.40}, cpu=0.50, scan=0.30)
    inner_new = _bench({"q": 0.41}, cpu=0.50, scan=0.30)
    p_old = tmp_path / "old.json"
    p_new = tmp_path / "new.json"
    p_old.write_text(json.dumps({"n": 9, "parsed": inner_old}))
    p_new.write_text(json.dumps(inner_new))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "compare_bench.py"),
            str(p_old),
            str(p_new),
            "--json",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    rep = json.loads(proc.stdout)
    assert rep["rows"][0]["verdict"] == "FLAT"


def test_mid_run_drift_widens_hypotheses():
    """The r9 paradox shape: a run whose host flipped mid-run (clean pre
    probe, degraded post probe — or vice versa). With the run bracketed by
    TWO calibrations, a query movement explained by EITHER window's ratio
    must adjudicate as HOST, not REGRESSION."""
    old = {
        "value": 0.30,
        "queries": {"q": 0.30},
        "calibration": {"cpu_sec": 0.5, "scan_sec": 0.3},
        "calibration_post": {"cpu_sec": 0.5, "scan_sec": 0.3},
    }
    new = {
        "value": 0.60,
        "queries": {"q": 0.60},
        # pre probe caught a clean window (ratio 1.0 -> looks like a raw 2x
        # regression), but the post probe shows the degraded window the
        # queries actually ran in (ratio 2.0 -> fully explained)
        "calibration": {"cpu_sec": 0.5, "scan_sec": 0.3},
        "calibration_post": {"cpu_sec": 1.0, "scan_sec": 0.6},
    }
    rep = cb.compare(old, new, threshold=0.15)
    assert set(rep["calibration_ratio"]) == {"cpu", "scan", "cpu_post", "scan_post"}
    assert rep["rows"][0]["verdict"] == "HOST"


def test_overlapping_bands_cap_verdict_at_flat():
    """Per-query min/max bands: when the two runs' rep ranges overlap, the
    median movement is not distinguishable from intra-run variance — no
    REGRESSION/IMPROVED verdict is supportable. Disjoint bands still
    adjudicate normally."""
    old = {
        "value": 2.0,
        "queries": {"wander": 1.15, "real": 0.40},
        "bands": {"wander": [0.98, 1.63], "real": [0.39, 0.41]},
        "calibration": {"cpu_sec": 0.5, "scan_sec": 0.3},
    }
    new = {
        "value": 2.6,
        "queries": {"wander": 1.41, "real": 1.20},
        "bands": {"wander": [0.97, 1.76], "real": [1.18, 1.25]},
        "calibration": {"cpu_sec": 0.5, "scan_sec": 0.3},
    }
    rep = cb.compare(old, new, threshold=0.15)
    verdicts = {r["query"]: r["verdict"] for r in rep["rows"]}
    assert verdicts == {"wander": "FLAT", "real": "REGRESSION"}
