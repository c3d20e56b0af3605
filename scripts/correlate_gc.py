#!/usr/bin/env python
"""Correlate a JVM unified-GC log against a bench_ingest batch trace
(r8 open item: attribute the bounded, self-recovering within-session
transients in batch_secs — major-GC hypothesis vs something else).

Usage:
  python scripts/correlate_gc.py <bench_json> <gc_log>

<bench_json> is bench_ingest.py stdout (one JSON line) from a run with
--gc-log <gc_log>: batch_starts_epoch aligns each batch's [start, end)
wall-clock window with the GC log's absolute timestamps.

Reports, per batch: wall seconds, summed GC pause ms inside the window,
and the pause breakdown (young/full/concurrent-cycle). Then the headline:
the rank correlation between batch wall time and in-window GC pause, and
the share of each SLOW batch's excess time (over the median batch)
explained by GC pauses.
"""

from __future__ import annotations

import json
import re
import sys
from datetime import datetime, timezone

# unified logging with :time,uptime decorators, e.g.
# [2026-08-16T11:02:03.123+0000][12.345s] GC(7) Pause Young (Normal) ... 12.345ms
_PAUSE = re.compile(
    r"\[(?P<ts>[0-9T:.+-]+)\]\[[0-9.]+s\]\s+GC\((?P<gid>\d+)\)\s+"
    r"Pause\s+(?P<kind>Young|Full|Remark|Cleanup)[^\n]*?(?P<ms>[0-9.]+)ms\s*$"
)


def _epoch(ts: str) -> float:
    # 2026-08-16T11:02:03.123+0000
    dt = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%f%z")
    return dt.astimezone(timezone.utc).timestamp()


def main() -> None:
    bench = json.loads(
        [ln for ln in open(sys.argv[1]) if ln.strip().startswith("{")][-1]
    )
    starts = bench["batch_starts_epoch"]
    secs = bench["batch_secs"]
    pauses: list[tuple[float, str, float]] = []  # (epoch, kind, ms)
    for line in open(sys.argv[2], errors="replace"):
        m = _PAUSE.search(line.rstrip())
        if m:
            pauses.append((_epoch(m.group("ts")), m.group("kind"), float(m.group("ms"))))
    pauses.sort()

    per_batch = []
    for i, (t0, w) in enumerate(zip(starts, secs)):
        t1 = t0 + w
        inwin = [(k, ms) for (te, k, ms) in pauses if t0 <= te < t1]
        gc_ms = sum(ms for _, ms in inwin)
        kinds = {}
        for k, ms in inwin:
            kinds[k] = kinds.get(k, 0.0) + ms
        per_batch.append({"batch": i, "wall_sec": w, "gc_ms": round(gc_ms, 1),
                          "kinds": {k: round(v, 1) for k, v in kinds.items()}})

    walls = sorted(secs)
    med = walls[len(walls) // 2]
    slow = [b for b in per_batch if b["wall_sec"] > 1.5 * med]
    for b in slow:
        excess = b["wall_sec"] - med
        share = (b["gc_ms"] / 1000.0) / excess if excess > 0 else 0.0
        b["excess_sec"] = round(excess, 2)
        b["gc_share_of_excess"] = round(share, 2)

    # Spearman-ish: rank correlation between wall and gc_ms
    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        for rank, i in enumerate(order):
            r[i] = rank
        return r

    rw = ranks([b["wall_sec"] for b in per_batch])
    rg = ranks([b["gc_ms"] for b in per_batch])
    n = len(per_batch)
    if n > 1:
        mw, mg = sum(rw) / n, sum(rg) / n
        num = sum((a - mw) * (b - mg) for a, b in zip(rw, rg))
        den = (sum((a - mw) ** 2 for a in rw) * sum((b - mg) ** 2 for b in rg)) ** 0.5
        rho = num / den if den else 0.0
    else:
        rho = 0.0

    print(json.dumps({
        "metric": "gc_batch_correlation",
        "median_batch_sec": med,
        "total_gc_pauses": len(pauses),
        "total_gc_sec": round(sum(ms for _, _, ms in pauses) / 1000.0, 1),
        "spearman_wall_vs_gc": round(rho, 3),
        "slow_batches": slow,
        "per_batch": per_batch,
    }))


if __name__ == "__main__":
    main()
