#!/usr/bin/env python
"""Calibration-normalized round-over-round bench comparison (r9 verdict
"Missing #1" / "Next round #2").

Every BENCH_r{N}.json since r9 carries a ``calibration`` record — two
constant microbenches with no engine code under test (``cpu_sec``: synthetic
range->hash-aggregate; ``scan_sec``: parquet scan+sum of one fixed table) —
measured on the same host, same session, right before the gated queries.
Host drift (hypervisor CPU steal, page-cache state) moves those constants by
the same mechanism that moves the queries; dividing query medians by the
calibration ratio removes the host from the comparison, which is exactly the
manual adjudication the r8->r9 phantom-regression episode cost a full cycle.

Usage:
    python scripts/compare_bench.py BENCH_r09.json BENCH_r10.json
    python scripts/compare_bench.py old.json new.json --threshold 0.15

Per query it prints the RAW new/old ratio and the ratio normalized under
each probe (cpu-bound and scan-bound hypotheses), then adjudicates
CONSERVATIVELY: a query is called a REGRESSION only if it is slower than
threshold under BOTH normalizations (i.e. even crediting the most generous
host-drift explanation it still regressed), IMPROVED only if faster under
both, otherwise FLAT (within noise) or HOST (the delta is explained by the
calibration movement). Exit code is 1 iff any REGRESSION survives, so the
script can gate a round.
"""
from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    """Accept both shapes: the raw bench JSON line (bench.py stdout) and
    the driver's BENCH_r{N}.json wrapper, which nests it under "parsed"."""
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def _ratios(new: dict, old: dict) -> dict[str, float]:
    """Host-speed hypotheses from every calibration record both sides
    carry. Since bench.py brackets the run (pre AND post probes — host
    state can flip mid-run), each (record, probe) pair that exists on both
    sides contributes one hypothesis; a drifting host widens the hypothesis
    set instead of silently mis-normalizing."""
    out: dict[str, float] = {}
    for rec, suffix in (("calibration", ""), ("calibration_post", "_post")):
        cal_new, cal_old = new.get(rec) or {}, old.get(rec) or {}
        for key, label in (("cpu_sec", "cpu"), ("scan_sec", "scan")):
            a, b = cal_new.get(key), cal_old.get(key)
            if a and b:  # missing/null probe: no hypothesis from this pair
                out[label + suffix] = a / b
    return out


def compare(old: dict, new: dict, threshold: float) -> dict:
    ratios = _ratios(new, old)
    qold, qnew = old.get("queries", {}), new.get("queries", {})
    rows, verdicts = [], {"REGRESSION": 0, "IMPROVED": 0, "FLAT": 0, "HOST": 0}
    for name in sorted(set(qold) & set(qnew)):
        o, n = qold[name], qnew[name]
        if not o or not n:
            continue
        raw = n / o
        # the hypothesis set always includes RAW: many gated queries at
        # small SF are dominated by fixed per-job scheduling overhead that
        # does NOT scale with host throughput, so dividing a 0.3 s median
        # by the calibration ratio OVER-corrects when the host got faster
        # (observed r10-vs-r9: a faster host turned unchanged queries into
        # phantom normalized regressions). A query is only called a
        # regression if it is slower under EVERY hypothesis — including
        # "the calibration doesn't transfer to this query at all".
        normed = {"raw": raw, **{p: raw / r for p, r in ratios.items()}}
        lo, hi = min(normed.values()), max(normed.values())
        # per-query min/max bands (3 reps) recorded since r7: overlapping
        # bands mean the two medians are draws from indistinguishable
        # distributions — no verdict stronger than FLAT is supportable,
        # whatever the median ratio says (e.g. q3 r8/r9/r10 medians wander
        # 1.15-1.41 inside a stable [0.9, 1.8] band)
        b_old = (old.get("bands") or {}).get(name)
        b_new = (new.get("bands") or {}).get(name)
        bands_overlap = (
            b_old is not None
            and b_new is not None
            and b_old[0] <= b_new[1]
            and b_new[0] <= b_old[1]
        )
        if bands_overlap:
            verdict = "FLAT"
        elif lo > 1 + threshold:
            verdict = "REGRESSION"  # slower under EVERY host hypothesis
        elif hi < 1 - threshold:
            verdict = "IMPROVED"  # faster under every host hypothesis
        elif abs(raw - 1) <= threshold:
            verdict = "FLAT"
        else:
            verdict = "HOST"  # raw moved, calibration explains it
        verdicts[verdict] += 1
        rows.append(
            {
                "query": name,
                "old_sec": o,
                "new_sec": n,
                "raw": round(raw, 3),
                **{f"norm_{p}": round(v, 3) for p, v in normed.items()},
                "verdict": verdict,
            }
        )
    report = {
        "old_total": old.get("value"),
        "new_total": new.get("value"),
        "calibration_ratio": {k: round(v, 3) for k, v in ratios.items()},
        "threshold": threshold,
        "counts": verdicts,
        "rows": rows,
    }
    if ratios:
        tot_raw = (new.get("value") or 0) / old["value"] if old.get("value") else None
        if tot_raw:
            report["total_raw"] = round(tot_raw, 3)
            report["total_normalized"] = {
                p: round(tot_raw / r, 3) for p, r in ratios.items()
            }
    return report


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.15)
    ap.add_argument("--json", action="store_true", help="machine output only")
    args = ap.parse_args()
    report = compare(_load(args.old), _load(args.new), args.threshold)

    if args.json:
        print(json.dumps(report))
    else:
        ratios = report["calibration_ratio"]
        if ratios:
            print(
                f"calibration ratio (new host / old host): "
                + ", ".join(f"{k}={v}" for k, v in ratios.items())
            )
        else:
            print(
                "WARNING: no calibration on one side - raw ratios only, "
                "host drift cannot be separated from code movement"
            )
        hdr = ["query", "old_s", "new_s", "raw"] + [
            f"/{k}" for k in ratios
        ] + ["verdict"]
        widths = [36, 8, 8, 7] + [7] * len(ratios) + [10]
        print("  ".join(h.ljust(w) for h, w in zip(hdr, widths)))
        for r in report["rows"]:
            cells = [
                r["query"][:36].ljust(36),
                f"{r['old_sec']:.3f}".ljust(8),
                f"{r['new_sec']:.3f}".ljust(8),
                f"{r['raw']:.3f}".ljust(7),
            ]
            for k in ratios:
                cells.append(f"{r.get('norm_' + k, float('nan')):.3f}".ljust(7))
            cells.append(r["verdict"])
            print("  ".join(cells))
        print(
            f"\ntotals: old={report['old_total']} new={report['new_total']}"
            + (
                f" raw x{report['total_raw']}"
                f" normalized {report.get('total_normalized')}"
                if report.get("total_raw")
                else ""
            )
        )
        print(f"verdict counts: {report['counts']}")
    return 1 if report["counts"]["REGRESSION"] else 0


if __name__ == "__main__":
    sys.exit(main())
