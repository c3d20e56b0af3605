#!/usr/bin/env python
"""Oracle-parity sweep at an arbitrary scale factor (default sf0.1).

The driver's correctness gate and tests/test_oracle_parity.py both run at
sf0.01. The engine's exactness claims are BY DESIGN scale-independent
(integer aggregates, decimal sums, md5-deterministic sampling — never
float-summation-order-dependent values in oracle-compared columns), but
that claim had only ever been exercised at one SF. This sweep re-runs
every oracle-backed registry query against DuckDB on the SAME parquet at a
second scale factor, so a scale-dependent correctness bug (overflow past a
fixture's range, a cap that silently binds at 10x rows, an
order-dependent tie) fails a recorded artifact instead of surviving until
someone scales up.

Usage:
    python scripts/parity_at_sf.py [sf_dir] [--out PARITY.json]

Prints ONE JSON line: {"metric": "oracle_parity", "sf_dir": ...,
"match": N, "mismatch": M, "rows_only": K, "failures": {...}}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
ap.add_argument("--out", default=None, help="also write the JSON here")
ap.add_argument("--only", default=None, help="comma-separated query names")
args = ap.parse_args()
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from eth_indexer_spark.session import get_spark
    from tests.conftest import TPCH_TABLES, frame_signature

    spark = get_spark("parity_at_sf", cpus=CPUS)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        keep = set(args.only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}

    match = mismatch = rows_only = 0
    failures: dict[str, str] = {}
    t0 = time.perf_counter()
    for name in sorted(queries):
        t1 = time.perf_counter()
        try:
            df = queries[name](spark, args.sf_dir)
            if name not in oracles:
                n = df.count()
                assert n > 0, f"degenerate 0-row result ({n})"
                rows_only += 1
                status = f"rows-only ({n} rows)"
            else:
                got = frame_signature(df.toPandas())
                want = frame_signature(con.execute(oracles[name]).df())
                if got[0] != want[0]:
                    raise AssertionError(f"rows {got[0]} != oracle {want[0]}")
                if got[1] != want[1]:
                    raise AssertionError(f"cols {got[1]} != {want[1]}")
                if got[2] != want[2]:
                    diffs = [(g, w) for g, w in zip(got[2], want[2]) if g != w][:3]
                    raise AssertionError(f"values differ; first {diffs}")
                assert got[0] > 0, "degenerate 0-row result"
                match += 1
                status = f"MATCH ({got[0]} rows)"
        except Exception as e:
            mismatch += 1
            failures[name] = f"{type(e).__name__}: {e}"
            status = f"FAIL {type(e).__name__}"
            traceback.print_exc(limit=3)
        finally:
            spark.catalog.clearCache()
        print(
            f"# {name}: {status} [{time.perf_counter() - t1:.1f}s]",
            file=sys.stderr,
        )

    out = {
        "metric": "oracle_parity",
        "sf_dir": args.sf_dir,
        "queries": len(queries),
        "match": match,
        "rows_only": rows_only,
        "mismatch": mismatch,
        "failures": failures,
        "elapsed_sec": round(time.perf_counter() - t0, 1),
        "cpus": CPUS,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()
    sys.exit(1 if mismatch else 0)


if __name__ == "__main__":
    main()
