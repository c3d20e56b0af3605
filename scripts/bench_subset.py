"""Bench a subset of queries with bench.py's exact methodology (count
action, median of 3 cold-cache reps after an sf0.001 warm pass), bracketed
by the same calibration probes — for quick A/B during optimization.

Usage: python scripts/bench_subset.py q1 q2 ...   (default: the changed set)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

DEFAULT = [
    "x_curation_v4",
    "x_cluster_keep_best",
    "x_dedup_ngram_jaccard_capped",
    "x_dedup_minhash_lsh",
    "x_substring_dedup",
]


def main() -> None:
    from eth_indexer_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench as benchmod

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("bench-subset", cpus=CPUS)
    registry = entrymod.queries()
    cal0 = benchmod._calibration(spark)
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        registry[name](spark, warm_dir).count()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    out = {}
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            registry[name](spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        samples.sort()
        out[name] = [round(samples[1], 3), round(samples[0], 3), round(samples[2], 3)]
        print(name, out[name], flush=True)
    cal1 = benchmod._calibration(spark)
    print(json.dumps({"queries": out, "calibration": cal0, "calibration_post": cal1}))
    spark.stop()


if __name__ == "__main__":
    main()
