#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

Each query is measured as the MEDIAN of 3 runs after a warm-up pass; timing
covers plan + execution to a driver-side count/collect of the (small)
result. The cache is cleared between runs so every rep is a cold-cache,
JIT-warm execution — the same condition earlier single-run rounds measured,
minus their run-order sensitivity.

Warm-up (JMH-style): every measured plan first runs once at the smallest
scale factor (sf0.001) so whole-stage-codegen compilation and JVM JIT of
each plan's operators happen OUTSIDE the measured run — the measurement is
steady-state engine throughput at the target scale, not one-time compiler
cost charged to whichever query happens to run first.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# The bench set: scan-heavy aggregation, multi-join, window/as-of, cumsum —
# the shapes that dominate cost at scale. Point lookups are excluded (they
# measure parquet footer latency, not engine throughput).
BENCH_QUERIES = (
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
    # r8: the GATED regression key is the capped (default, adversarial-
    # corpus-safe) n-gram Jaccard. Its opt-in exact sibling was the gate's
    # noisiest key (2.2× run-to-run spread swamping every other legacy
    # query's signal — r7 verdict "What's wrong #1"); it is still measured,
    # but reported under "ungated" and excluded from the headline total.
    "x_dedup_ngram_jaccard_capped",
    "x_dedup_minhash_lsh",
    "x_ann_cosine_topk",
    "x_text_quality",
    # round-7 additions: the curation wave's heavyweights, so regressions
    # in the newer operators show up in BENCH_rN diffs. Appended AFTER the
    # 19 legacy keys, which keep their names — r06↔r07 diffs stay valid.
    "x_substring_dedup",
    "x_curation_v4",
    "x_lm_unigram_score",
    "x_cluster_keep_best",
)

# Measured and reported, but OUTSIDE the gated total: deliberately-weak
# opt-in baselines whose variance would otherwise dominate round-over-round
# diffs of the headline number.
UNGATED_QUERIES = ("x_dedup_ngram_jaccard",)


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def _calibration(spark) -> dict:
    """Fixed host-drift probe (r8 verdict "What's wrong #1"): two constant
    microbenches with NO engine code under test, measured every round so
    cross-round BENCH diffs can be normalized for host noise — the r8
    round's +15% phantom regression on unchanged queries cost a full
    adjudication cycle that one recorded constant would have settled.

    - ``cpu_sec``: synthetic range scan -> hash aggregate (2e8 rows, fixed
      partitioning) — pure JVM/codegen/shuffle-machinery throughput.
    - ``scan_sec``: parquet scan + sum over one fixed target-SF table
      column — disk/page-cache + parquet decode throughput.

    Each is median of 5 after one unmeasured JIT rep. Interpreting BENCH
    r(N) vs r(N-1): divide query medians by the calibration ratio before
    calling a delta a regression."""
    from pyspark.sql import functions as F

    def med(fn) -> float:
        fn()  # unmeasured: JIT/codegen warm
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return round(samples[len(samples) // 2], 4)

    def cpu():
        (
            spark.range(0, 200_000_000, 1, CPUS)
            .select((F.col("id") % 997).alias("k"), (F.col("id") * 31).alias("v"))
            .groupBy("k")
            .agg(F.sum("v"))
            .count()
        )

    lineitem = os.path.join(SF_DIR, "lineitem.parquet")

    def scan():
        spark.read.parquet(lineitem).agg(F.sum("l_extendedprice")).collect()
        spark.catalog.clearCache()

    out = {"cpu_sec": med(cpu)}
    # the scan probe reads one fixed target-SF table; a missing/renamed
    # table must DEGRADE calibration (scan_sec null), not crash the bench
    # before any query runs
    try:
        if os.path.exists(lineitem):
            out["scan_sec"] = med(scan)
        else:
            out["scan_sec"] = None
    except Exception:
        out["scan_sec"] = None
    return out


def main() -> None:
    from eth_indexer_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench", cpus=CPUS)
    # host-drift calibration FIRST (constant work, no engine code), so the
    # recorded number reflects the host the queries are about to run on —
    # and AGAIN after the query loop (see below): host state can flip on
    # tens-of-minutes timescales (measured in r9), so a single start-of-run
    # probe can misrepresent the window the queries actually ran in
    calibration = _calibration(spark)
    registry = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in registry]
    ungated = [n for n in UNGATED_QUERIES if n in registry]

    # warm-up: run every measured plan at the smallest SF — compiles codegen
    # + JITs each plan's operators; the target-scale data is not touched
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names + ungated:
        try:
            registry[name](spark, warm_dir).count()
        except Exception:
            pass  # a query without sf0.001 support still benches cold
    # Drop every relation the warm-up pass persisted (several dedup/ANN plans
    # cache intermediates): leaving 19 plans' worth of sf0.001 blocks resident
    # perturbs the measured run (observed as 2.5-3.8× jumps on unchanged
    # queries in r03). Then settle the JVM before measuring.
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    # plus a byte-level pre-read of every target-SF parquet file so the OS
    # page cache is warm before rep 1 — without this, whichever query first
    # touches a table after a reboot pays the cold-disk walk and skews its
    # median (observed as 1.5-2× swings on otherwise-unchanged queries) —
    # and one registry query so footers/listing caches warm as before
    for entry in os.scandir(SF_DIR):
        if entry.is_file():
            with open(entry.path, "rb") as fh:
                while fh.read(1 << 22):
                    pass
    registry[names[0]](spark, SF_DIR).count()
    spark.catalog.clearCache()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    bands: dict[str, list[float]] = {}
    ungated_timings: dict[str, float] = {}

    def _measure(name: str) -> tuple[float, list[float]]:
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = registry[name](spark, SF_DIR)
            df.count()
            samples.append(time.perf_counter() - t0)
            # a plan's own persists must not warm its next rep
            spark.catalog.clearCache()
        samples.sort()
        # per-query variance band (min/max over the reps), so round-over-
        # round diffs compare against a band, not a point (r7 verdict #3)
        return samples[len(samples) // 2], [samples[0], samples[-1]]

    for name in names:
        med, band = _measure(name)
        timings[name] = round(med, 4)
        bands[name] = [round(band[0], 4), round(band[1], 4)]
    for name in ungated:
        med, band = _measure(name)
        ungated_timings[name] = round(med, 4)
        bands[name] = [round(band[0], 4), round(band[1], 4)]
    total = round(sum(timings.values()), 4)
    # post-run calibration: brackets the measurement window, so a host that
    # drifted mid-run is visible as pre/post disagreement instead of
    # silently mis-normalizing every query (scripts/compare_bench.py treats
    # both as hypotheses)
    calibration_post = _calibration(spark)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ungated": ungated_timings,
                "bands": bands,
                "calibration": calibration,
                "calibration_post": calibration_post,
                "sf": _sf_from_dir(SF_DIR),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
