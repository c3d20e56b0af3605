"""Dump .explain("formatted") for every gated bench query to plans/r10/.

Usage: python scripts/dump_plans.py <suffix>   (suffix = before|after)
Plan generation is driver-side only; no jobs run. sf0.1 paths, matching
the bench's target scale factor.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])  # optional subset of query names
    from eth_indexer_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench as benchmod

    spark = get_spark("dump-plans", cpus=8)
    registry = entrymod.queries()
    names = list(benchmod.BENCH_QUERIES) + list(benchmod.UNGATED_QUERIES)
    outdir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if only and name not in only:
            continue
        df = registry[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
