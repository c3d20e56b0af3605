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


def _ratio(new: dict, old: dict, key: str) -> float | None:
    a, b = (new.get("calibration") or {}).get(key), (
        old.get("calibration") or {}
    ).get(key)
    if not a or not b:  # missing or null probe: no normalization available
        return None
    return a / b


def compare(old: dict, new: dict, threshold: float) -> dict:
    r_cpu = _ratio(new, old, "cpu_sec")
    r_scan = _ratio(new, old, "scan_sec")
    ratios = {k: v for k, v in {"cpu": r_cpu, "scan": r_scan}.items() if v}
    qold, qnew = old.get("queries", {}), new.get("queries", {})
    rows, verdicts = [], {"REGRESSION": 0, "IMPROVED": 0, "FLAT": 0, "HOST": 0}
    for name in sorted(set(qold) & set(qnew)):
        o, n = qold[name], qnew[name]
        if not o or not n:
            continue
        raw = n / o
        normed = {probe: raw / r for probe, r in ratios.items()} or {"raw": raw}
        lo, hi = min(normed.values()), max(normed.values())
        if lo > 1 + threshold:
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
