"""Split each gated bench query's timed cost into CONSTRUCTION (Python plan
building, the part bench.py times before .count() submits jobs) vs EXECUTION.

Usage: python scripts/construct_vs_exec.py [query ...]
Method mirrors bench.py: warm each plan at sf0.001 first, clearCache between
reps, median of 3.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    from eth_indexer_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench as benchmod

    spark = get_spark("construct-vs-exec", cpus=CPUS)
    registry = entrymod.queries()
    names = sys.argv[1:] or (
        list(benchmod.BENCH_QUERIES) + list(benchmod.UNGATED_QUERIES)
    )
    for name in names:
        try:
            registry[name](spark, WARM_DIR).count()
        except Exception:
            pass
        spark.catalog.clearCache()
    print(f"{'query':35s} {'construct':>9s} {'execute':>9s} {'total':>9s}")
    for name in names:
        cons, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = registry[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            spark.catalog.clearCache()
        cons.sort(); execs.sort()
        print(
            f"{name:35s} {cons[1]:9.3f} {execs[1]:9.3f} {cons[1]+execs[1]:9.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
