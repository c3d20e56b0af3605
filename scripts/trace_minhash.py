#!/usr/bin/env python
"""Trace the x_dedup_minhash_lsh intra-run spread (r8 verdict "What's
wrong" #2: driver band [3.32, 15.61] s across 3 reps in ONE process).

Reproduces the bench harness's measurement loop (same query, same SF, same
clearCache-between-reps) for N reps, recording per rep:

  - wall seconds (the number whose spread we're chasing)
  - GC collection count + time delta (per collector) — the GC-debt
    hypothesis: a major GC landing inside one rep adds seconds
  - Spark job ids issued (job-count delta) — the recompute hypothesis: a
    slow rep re-executing stages shows MORE jobs/stages, not slower ones
  - persisted-RDD count before/after — the persist-pool/clearCache
    interaction hypothesis (the r6 shared-cache-entry class)

Optionally (--bench-context) runs the queries that PRECEDE minhash in
bench.py first, so pool/cache state matches the driver's run when the
spread was observed.

Run SOLO — concurrent Spark JVMs give 2-5x timing noise and would bury
the signal being traced.

Prints ONE JSON line with per-rep records.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# the bench.py keys measured before x_dedup_minhash_lsh (same order)
PRECEDING = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j5_broadcast_dim_join",
    "j6_fact_fact_join",
    "j1_latest_per_key",
    "j2_asof_join_stream",
    "j3_asof_all_keys",
    "a5_fee_sum_per_sender",
    "a7_cumulative_per_group",
    "a10_global_running_sum",
    "j4_semi_join",
    "a4_distinct_users",
    "a12_count_distinct",
    "x_dedup_exact",
    "x_dedup_ngram_jaccard_capped",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--query", default="x_dedup_minhash_lsh")
    ap.add_argument(
        "--bench-context",
        action="store_true",
        help="run the bench queries that precede minhash first (one pass), "
        "so persist-pool/cache state matches the driver's run",
    )
    args = ap.parse_args()

    from eth_indexer_spark.operators._persist import pooled_sites
    from eth_indexer_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("trace_minhash", cpus=CPUS)
    sc = spark.sparkContext
    registry = entrymod.queries()

    def gc_stats() -> dict[str, tuple[int, int]]:
        beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        out = {}
        for i in range(beans.size()):
            b = beans.get(i)
            out[b.getName()] = (int(b.getCollectionCount()), int(b.getCollectionTime()))
        return out

    def heap_used_mb() -> int:
        mem = sc._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
        return int(mem.getHeapMemoryUsage().getUsed() // (1 << 20))

    def cached_rdds() -> int:
        return int(sc._jsc.getPersistentRDDs().size())

    def last_job_id() -> int:
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) if ids else -1

    if args.bench_context:
        for name in PRECEDING:
            if name in registry:
                registry[name](spark, SF_DIR).count()
                spark.catalog.clearCache()

    # warm-up (bench.py warms at sf0.001; same effect for codegen/JIT)
    registry[args.query](spark, SF_DIR).count()
    spark.catalog.clearCache()

    reps = []
    for r in range(args.reps):
        g0, j0, c0, h0 = gc_stats(), last_job_id(), cached_rdds(), heap_used_mb()
        t0 = time.perf_counter()
        registry[args.query](spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        g1, j1, c1, h1 = gc_stats(), last_job_id(), cached_rdds(), heap_used_mb()
        spark.catalog.clearCache()
        gc_delta = {
            name: {
                "collections": g1[name][0] - g0.get(name, (0, 0))[0],
                "ms": g1[name][1] - g0.get(name, (0, 0))[1],
            }
            for name in g1
        }
        reps.append(
            {
                "rep": r,
                "wall_sec": round(wall, 3),
                "gc": gc_delta,
                "jobs": j1 - j0,
                "cached_rdds_before": c0,
                "cached_rdds_after": c1,
                "heap_mb_before": h0,
                "heap_mb_after": h1,
                "pool_sites": pooled_sites(),
            }
        )
        print(
            f"# rep {r}: {wall:.2f}s  jobs={j1 - j0}  "
            f"gc_ms={sum(d['ms'] for d in gc_delta.values())}  "
            f"heap={h0}->{h1}MB  cached={c0}->{c1}",
            file=sys.stderr,
        )

    walls = sorted(x["wall_sec"] for x in reps)
    print(
        json.dumps(
            {
                "metric": "minhash_trace",
                "query": args.query,
                "median_sec": walls[len(walls) // 2],
                "band": [walls[0], walls[-1]],
                "bench_context": args.bench_context,
                "reps": reps,
                "sf_dir": SF_DIR,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
