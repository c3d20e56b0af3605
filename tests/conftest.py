"""Shared Spark session + oracle-comparison helpers for the test suite."""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
import pytest

from eth_indexer_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "local_cluster: multi-JVM local-cluster[n,c,m] validation "
        "(runs a subprocess SparkSession; skippable where unsupported)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("eth_indexer_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the sf0.01 tables registered as views, matching
    the driver's oracle environment."""
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(v):
    """Canonicalize a cell so Spark and DuckDB results compare exactly —
    models the driver's order-insensitive value hash (strongest form:
    object equality)."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def frame_signature(pdf):
    """(n_rows, sorted column names, sorted canonical row tuples)."""
    cols = sorted(pdf.columns)
    rows = sorted(tuple(canon(v) for v in row) for row in pdf[cols].itertuples(index=False))
    return len(pdf), cols, rows


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "?"):
    got = frame_signature(spark_df.toPandas())
    want = frame_signature(duck_con.execute(sql).df())
    assert got[0] == want[0], f"{name}: row count {got[0]} != oracle {want[0]}"
    assert got[1] == want[1], f"{name}: columns {got[1]} != oracle {want[1]}"
    if got[2] != want[2]:
        diffs = [
            (g, w) for g, w in zip(got[2], want[2]) if g != w
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs {diffs}")
