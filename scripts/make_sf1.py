#!/usr/bin/env python
"""Generate an sf1 dataset (10x sf0.1) for local scale-proof runs.

The driver testdata stops at sf0.1 (TESTDATA.md); the 100 TB design claims
are plan-level until measured across a scale step. This script extends the
driver's own scaling law one decade — 0.01→0.1 multiplied facts, documents
and events by 10 and embeddings by 4 with dimensions fixed, so sf1 does the
same on top of sf0.1 — by deterministic key-remapped replication (copy c
adds ``c * 10_000_000`` to every id; all FK relationships stay within-copy
consistent, so join selectivities are scale-invariant).

Documents get a per-copy VOCABULARY transform (every word suffixed ``_c<c>``
for c>0): each copy is an isomorphic re-vocabularied clone of the original
corpus, so duplicate families / shared substrings / shingle collisions
scale in NUMBER (10x families) while keeping their original sizes — the
workload shape a 10x-bigger crawl actually has. Naive replication would
instead make every document a 10-way exact dup (a different, degenerate
workload). Embeddings rotate by ``7*c`` positions — norm-preserving, so
within-copy neighbor structure is exactly the original and cross-copy
cosine is that of unrelated vectors.

DuckDB generation: single parquet file per table (the catalog's footer
probe expects files, not directories), microsecond timestamps (the loader's
ns handling is bypassed, which it tolerates by design — catalog.py).

Usage: python scripts/make_sf1.py [out_dir] [--src DIR] [--offset N]
                                  [--docs-only]
  out_dir  default /root/repo/_scale/sf1
  --src    source sf dir (default /root/testdata/sf0.1); point it at a
           generated sf1 to build the NEXT decade (sf10) — the per-copy
           vocabulary suffix composes (w_c3 -> w_c3_c7: copies of copies
           stay isomorphic, never near-dups of each other)
  --offset id offset per copy; must exceed the source's max id (default
           1e7 for sf0.1 -> sf1; use 1e9 for sf1 -> sf10)
  --docs-only  generate only documents + embeddings (the document-pipeline
           tables) — the second decade targets the curation operators
Deterministic: same input -> byte-identical logical content.
"""

from __future__ import annotations

import argparse
import os

import duckdb

FACT_COPIES = 10
EMB_COPIES = 4


def copies_cte(n: int) -> str:
    return f"(SELECT unnest(range({n})) AS c)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/root/repo/_scale/sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--offset", type=int, default=10_000_000)
    ap.add_argument("--docs-only", action="store_true")
    args = ap.parse_args()
    out, OFF = args.out, args.offset
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    max_id = con.execute(
        f"SELECT greatest(max(doc_id), max(abs(doc_id))) FROM {src('documents')}"
    ).fetchone()[0]
    if OFF <= max_id:
        raise SystemExit(
            f"--offset {OFF} must exceed the source's max id {max_id} "
            "(copies would collide)"
        )

    def write(t: str, sql: str) -> None:
        path = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{t}: {n}")

    if args.docs_only:
        _write_documents(write, src, OFF)
        _write_embeddings(write, src, OFF)
        return

    # dimensions: fixed, as in the driver's own 0.01 -> 0.1 step
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    # keyed dims scale with facts (driver scaled customer/supplier/part 10x)
    write("customer", f"""
        SELECT c_custkey + c*{OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}, {copies_cte(FACT_COPIES)}""")
    write("supplier", f"""
        SELECT s_suppkey + c*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, {copies_cte(FACT_COPIES)}""")
    write("part", f"""
        SELECT p_partkey + c*{OFF} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src('part')}, {copies_cte(FACT_COPIES)}""")
    write("orders", f"""
        SELECT o_orderkey + c*{OFF} AS o_orderkey, o_custkey + c*{OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {copies_cte(FACT_COPIES)}""")
    write("lineitem", f"""
        SELECT l_orderkey + c*{OFF} AS l_orderkey, l_partkey + c*{OFF} AS l_partkey,
               l_suppkey + c*{OFF} AS l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM {src('lineitem')}, {copies_cte(FACT_COPIES)}""")
    write("events", f"""
        SELECT event_id + c*{OFF} AS event_id, ts, user_id + c*{OFF} AS user_id,
               event_type, value, props
        FROM {src('events')}, {copies_cte(FACT_COPIES)}""")

    _write_documents(write, src, OFF)
    _write_embeddings(write, src, OFF)


def _write_documents(write, src, OFF: int) -> None:
    # per-copy vocabulary (see module docstring)
    write("documents", f"""
        SELECT doc_id + c*{OFF} AS doc_id,
               CASE WHEN c = 0 THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || '_c' || CAST(c AS VARCHAR)), ' ')
               END AS text,
               lang, source,
               CASE WHEN c = 0 THEN n_chars
                    ELSE length(array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || '_c' || CAST(c AS VARCHAR)), ' '))
               END AS n_chars
        FROM {src('documents')}, {copies_cte(FACT_COPIES)}""")


def _write_embeddings(write, src, OFF: int) -> None:
    # 4x (the driver's own 0.01 -> 0.1 ratio), rotated per copy
    write("embeddings", f"""
        SELECT vec_id + c*{OFF} AS vec_id,
               CASE WHEN c = 0 THEN embedding
                    ELSE list_concat(embedding[7*c+1:64], embedding[1:7*c])
               END::FLOAT[] AS embedding,
               label
        FROM {src('embeddings')}, {copies_cte(EMB_COPIES)}""")


if __name__ == "__main__":
    main()
