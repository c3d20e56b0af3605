"""Chain-state service stand-in: the reference's batched balance RPC fan-out
(client/balancer.go:43-116 — N accounts × M tokens per block hash, chunked at
1000 requests per batch RPC, client/client.go:156-225) re-expressed as a
distributed ``mapInPandas`` lookup.

In production this would call an archive node; the engine derives balances
from its own ledger instead (pipeline/transform.py). This module exists for
parity with the reference's integration seam: a pluggable ``lookup_fn``
receives (token, address) request batches of ≤ ``chunk_size`` and returns
decimal-string balances. The default implementation is a deterministic fake
(balance = f(token, address)) so the plumbing — partitioned fan-out, Arrow
batching, chunking — is real and testable without a node.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# matches client.ChunkSize (client/balancer.go:31-33)
DEFAULT_CHUNK_SIZE = 1000

LookupFn = Callable[[pd.DataFrame], pd.Series]


def deterministic_fake_lookup(req: pd.DataFrame) -> pd.Series:
    """Deterministic stand-in: a stable pseudo-balance per (token, address).
    Replace with a real RPC client in production deployments."""
    return (
        req["token"].str.slice(0, 8).apply(int, base=16)
        + req["address"].str.slice(0, 8).apply(int, base=16) * 7
    ).astype(str)


def fetch_balances(
    requests: DataFrame,
    lookup_fn: LookupFn | None = None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """Fan out balance lookups across the cluster.

    ``requests``: DataFrame with ``token`` and ``address`` columns (plus any
    passthrough columns — the ingest path adds ``block_number`` so the
    lookup has the reference's at-block semantics, client/balancer.go:43-116
    querying balanceOf at a specific block hash). Each task slices its Arrow
    batches into ``chunk_size`` request chunks — the reference's RPC
    batching — and calls ``lookup_fn`` per chunk. Executor-side and parallel
    per partition, unlike the reference's single-threaded client loop.
    """
    fn = lookup_fn or deterministic_fake_lookup
    from pyspark.sql import types as T

    schema = T.StructType(list(requests.schema.fields) + [T.StructField("balance", T.StringType())])

    def _lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), chunk_size):
                chunk = pdf.iloc[start : start + chunk_size].copy()
                chunk["balance"] = fn(chunk).values
                yield chunk

    return requests.mapInPandas(_lookup, schema=schema)


# ---------------------------------------------------------------------------
# ERC20 metadata (client/client.go:112-148): the reference reads name /
# totalSupply / decimals from the contract at registration via three eth_call
# round-trips. Same pluggable-seam shape as the balance fan-out: a
# ``MetadataFn`` takes the token address and returns the three fields; the
# default is a deterministic fake so registration works without a node.
# Driver-side single call by design — registration is one token at a time in
# the reference too (service/indexer/indexer.go:88-120), never a hot path.
# ---------------------------------------------------------------------------

MetadataFn = Callable[[str], dict]


def deterministic_fake_metadata(address: str) -> dict:
    """Deterministic stand-in for the contract reads: stable pseudo-metadata
    per token address. Replace with a real RPC client in production."""
    hex_part = address[2:] if address.startswith("0x") else address
    seed = int(hex_part[:8] or "0", 16)
    return {
        "name": f"TOKEN-{hex_part[:8]}",
        "total_supply": str(seed * 10**18),
        "decimals": 18,
    }


def fetch_token_metadata(address: str, metadata_fn: MetadataFn | None = None) -> dict:
    """Resolve a token's on-chain metadata through the pluggable seam,
    validating the contract shape the reference assumes (an ERC20 with
    name()/totalSupply()/decimals())."""
    meta = (metadata_fn or deterministic_fake_metadata)(address)
    missing = {"name", "total_supply", "decimals"} - set(meta)
    if missing:
        raise ValueError(f"token metadata for {address} missing fields: {sorted(missing)}")
    return {
        "name": str(meta["name"]),
        "total_supply": str(meta["total_supply"]),
        "decimals": int(meta["decimals"]),
    }
