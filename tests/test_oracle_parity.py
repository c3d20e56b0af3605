"""Local mirror of the driver's correctness gate: run every registered query
through Spark at sf0.01 and compare against its DuckDB oracle (row count +
schema + order-insensitive canonical values)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECTNESS, SF_SMOKE, assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    if name in ORACLES:
        assert_matches_oracle(df, duck, ORACLES[name], name)
        # degeneracy guard: a 0-row result trivially "matches" its oracle;
        # every registered query must exercise real rows at sf0.01
        assert df.count() > 0, f"{name}: degenerate 0-row result"
    else:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() > 0, f"{name}: degenerate 0-row result"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_smoke_sf(spark, name):
    assert QUERIES[name](spark, SF_SMOKE).count() >= 0
