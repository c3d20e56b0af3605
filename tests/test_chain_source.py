"""Batched external-lookup stand-in (sources/chain.py vs client/balancer.go)."""

from __future__ import annotations

from eth_indexer_spark.sources.chain import deterministic_fake_lookup, fetch_balances
from tests.fixtures import A1, A2, T1, ETH


def test_fetch_balances_plumbing(spark):
    req = spark.createDataFrame(
        [(ETH, A1), (ETH, A2), (T1, A1), (T1, A2)], "token string, address string"
    )
    out = fetch_balances(req, chunk_size=2)
    rows = {(r["token"], r["address"]): r["balance"] for r in out.collect()}
    assert len(rows) == 4
    # deterministic: same inputs → same balances
    import pandas as pd
    expect = deterministic_fake_lookup(pd.DataFrame({"token": [ETH], "address": [A1]}))
    assert rows[(ETH, A1)] == expect.iloc[0]


def test_custom_lookup_fn_and_chunking(spark):
    calls = []

    def fn(chunk):
        calls.append(len(chunk))
        return chunk["address"].str.len().astype(str)

    req = spark.createDataFrame([(ETH, f"{i:040x}") for i in range(10)],
                                "token string, address string").coalesce(1)
    out = fetch_balances(req, lookup_fn=fn, chunk_size=3)
    assert out.count() == 10
    assert all(r["balance"] == "40" for r in out.collect())


# -- ERC20 metadata seam (client/client.go:112-148) ---------------------------


def test_fake_metadata_is_deterministic_and_complete():
    from eth_indexer_spark.sources.chain import (
        deterministic_fake_metadata,
        fetch_token_metadata,
    )

    t = "0x" + "ab" * 20
    m1, m2 = fetch_token_metadata(t), fetch_token_metadata(t)
    assert m1 == m2
    assert set(m1) == {"name", "total_supply", "decimals"}
    assert m1 == {
        "name": deterministic_fake_metadata(t)["name"],
        "total_supply": deterministic_fake_metadata(t)["total_supply"],
        "decimals": 18,
    }


def test_custom_metadata_fn_and_validation():
    import pytest

    from eth_indexer_spark.sources.chain import fetch_token_metadata

    got = fetch_token_metadata(
        "0xdead", lambda a: {"name": "DT", "total_supply": 5, "decimals": "6"}
    )
    assert got == {"name": "DT", "total_supply": "5", "decimals": 6}

    with pytest.raises(ValueError, match="missing fields"):
        fetch_token_metadata("0xdead", lambda a: {"name": "DT"})
