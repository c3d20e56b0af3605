"""Deterministic domain-shaped fixtures per FIXTURES.md, plus an independent
pure-Python golden model of the pipeline semantics (mirrors the hand-computed
assertions of store/transfer_processor_test.go:38-789 and store/store_test.go).

Scenario coverage (FIXTURES.md §Scenario requirements):
1. happy path: 3 subscribed accounts in 2 groups; ETH transfers between
   subscribed accounts; ERC20 Transfer logs for a registered token; a
   zero-value contract call that still pays fees; a block mined by a
   subscribed coinbase; a block with 2 uncles (one subscribed coinbase);
2. unregistered-token logs that must be ignored;
3. sparse seed balances at non-contiguous blocks for as-of queries;
4. (reorg branches exercised in streaming tests);
5. duplicate headers exercised in streaming tests;
6. uint256 values > 1e38 (ERC20 value 10^39, ETH amount 2×10^39).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

BASE_REWARD = 5 * 10**18  # blocks < Byzantium (common/utils.go:221-229)

ETH = "0000000000000000000000000000000000455448"
MINER_FROM = "00000000000000004d494e455220524557415244"
UNCLE_FROM = "0000000000000000554e434c4520524557415244"
TRANSFER_SIG = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


def addr(i: int) -> str:
    return f"{i:040x}"


def h32(tag: str) -> str:
    return tag.encode().hex().rjust(64, "0")[-64:]


def bhash(n: int) -> str:
    return f"b{n}".encode().hex().rjust(64, "0")


def thash(tag: str) -> str:
    return f"tx{tag}".encode().hex().rjust(64, "0")


def topic_addr(a: str) -> str:
    return a.rjust(64, "0")


def u256_bytes(v: int) -> bytes:
    return v.to_bytes(32, "big")


from eth_indexer_spark.schema import RAW_SCHEMAS  # noqa: E402  (single source of truth)

A1, A2, A3, A9 = addr(1), addr(2), addr(3), addr(9)
T1 = addr(0xAAAA)          # registered ERC20
TX = addr(0xBBBB)          # unregistered token (logs ignored)

NOW = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

CONTRACT = addr(0xCCCC)  # a contract that moves ether internally (unsubscribed)

# (number, coinbase, difficulty, [(tx_tag, from, to, amount, gas_price, gas_used)],
#  [(tx_tag, contract, topic0, from, to, value)], [(uncle_hash_tag, uncle_coinbase, uncle_number)],
#  optional [(tx_tag, from, to, value)] INTERNAL ether transfers — state-diff
#  movements executed inside contract calls, invisible to tx.amount
#  (debug_getTransferLogs, client/client.go:150-154))
BLOCKS = [
    (100, A9, 100, [("100a", A1, A2, 1000, 5, 4)], [], []),
    (101, A9, 101, [("101a", A9, A1, 7, 3, 2)],
     [("101a", T1, TRANSFER_SIG, A2, A3, 500), ("101a", TX, TRANSFER_SIG, A1, A3, 777)], []),
    (102, A9, 102, [("102a", A1, A2, 0, 7, 3)],
     [("102a", T1, "NA", None, None, None)], [],
     [("102a", CONTRACT, A3, 55)]),  # zero-value call pays out ether internally
    (103, A1, 103, [], [], []),
    (104, A9, 104, [("104a", A9, A2, 2 * 10**39, 4, 5)],
     [("104a", T1, TRANSFER_SIG, A1, A2, 10**39)],
     [("u104a", A3, 103), ("u104b", A9, 102)]),
    (105, A9, 105, [("105a", A2, A1, 300, 2, 10)], [], []),
]


def _norm(block: tuple) -> tuple:
    """Normalize a block tuple to 7 fields (internal transfers optional)."""
    if len(block) == 7:
        return block
    number, coinbase, diff, txs, logs, uncles = block
    return number, coinbase, diff, txs, logs, uncles, []

SUBSCRIPTIONS = [  # (id, block_number, group, address)
    (1, 90, 1, A1),
    (2, 95, 1, A2),
    (3, 95, 2, A3),
]

# sparse seed balances: (token, block_number, address, balance, group)
SEED_BALANCES = [
    (ETH, 90, A1, 10**6, 1),
    (ETH, 95, A2, 5000, 1),
    (ETH, 80, A3, 700, 2),
    (ETH, 95, A3, 800, 2),
    (T1, 90, A1, 10**40, 1),   # > 1e38 seed balance
    (T1, 95, A2, 10000, 1),
    (T1, 95, A3, 50, 2),
]

ERC20_REGISTRY = [(T1, 95, str(10**40), 18, "TokenOne")]


def uncle_reward(block_n: int, uncle_n: int) -> int:
    return (8 + uncle_n - block_n) * BASE_REWARD // 8


def build_raw(
    blocks=BLOCKS, prefix: str = "b", fork_parent: tuple[int, str] | None = None
) -> dict[str, pd.DataFrame]:
    """Raw tables for a block list. ``prefix`` names the branch (block hashes
    become ``<prefix><n>``); ``fork_parent=(n, hash)`` points block n's
    parent at another branch — used to build reorg forks."""
    def bh(n: int) -> str:
        return f"{prefix}{n}".encode().hex().rjust(64, "0")

    headers, txs, receipts, logs, tlogs = [], [], [], [], []
    for block in blocks:
        number, coinbase, diff, block_txs, block_logs, uncles, internals = _norm(block)
        u = list(uncles) + [None, None]
        parent = (
            fork_parent[1]
            if fork_parent is not None and number == fork_parent[0]
            else bh(number - 1)
        )
        headers.append({
            "hash": bh(number), "parent_hash": parent,
            "uncle_hash": h32(f"u{number}"), "coinbase": coinbase,
            "root": h32(f"r{number}"), "tx_hash": h32(f"t{number}"),
            "receipt_hash": h32(f"rc{number}"),
            "difficulty": diff, "number": number,
            "gas_limit": 8_000_000, "gas_used": sum(t[5] for t in block_txs),
            "time": 1_700_000_000 + 13 * number,
            "extra_data": b"", "mix_digest": h32(f"m{number}"),
            "nonce": f"{number:016x}",
            "uncle1_hash": thash(u[0][0]) if u[0] else "",
            "uncle1_coinbase": u[0][1] if u[0] else "",
            "uncle1_number": u[0][2] if u[0] else None,
            "uncle2_hash": thash(u[1][0]) if u[1] else "",
            "uncle2_coinbase": u[1][1] if u[1] else "",
            "uncle2_number": u[1][2] if u[1] else None,
            "created_at": NOW,
        })
        cum = 0
        for i, (tag, f_, t_, amount, gp, gu) in enumerate(block_txs):
            txs.append({
                "hash": thash(tag), "block_hash": bh(number),
                "from": f_, "to": t_, "nonce": i,
                "gas_price": gp, "gas_limit": gu * 2,
                "amount": str(amount), "payload": b"",
                "block_number": number,
            })
            cum += gu
            receipts.append({
                "root": h32(f"rr{tag}"), "status": 1,
                "cumulative_gas_used": cum, "bloom": b"\x00" * 8,
                "tx_hash": thash(tag), "contract_address": None,
                "gas_used": gu, "block_number": number,
            })
            # state-diff log: every top-level value transfer is also a
            # debug_getTransferLogs row (the state diff sees all ether moves)
            if amount != 0:
                tlogs.append({
                    "block_number": number, "tx_hash": thash(tag),
                    "from": f_, "to": t_, "value": str(amount),
                })
        for tag, f_, t_, value in internals:
            tlogs.append({
                "block_number": number, "tx_hash": thash(tag),
                "from": f_, "to": t_, "value": str(value),
            })
        log_idx: dict[str, int] = {}
        for tag, contract, topic0, f_, t_, value in block_logs:
            logs.append({
                "tx_hash": thash(tag), "block_number": number,
                "contract_address": contract, "event_name": topic0,
                "topic1": topic_addr(f_) if f_ else None,
                "topic2": topic_addr(t_) if t_ else None,
                "topic3": None,
                "data": u256_bytes(value) if value is not None else b"",
                "log_index": log_idx.setdefault(tag, 0),
            })
            log_idx[tag] += 1
    subs = pd.DataFrame(
        [{"id": i, "block_number": bn, "group": g, "address": a,
          "created_at": NOW, "updated_at": NOW}
         for i, bn, g, a in SUBSCRIPTIONS]
    )
    seed = pd.DataFrame(
        [{"token": t, "block_number": bn, "address": a, "balance": str(b), "group": g}
         for t, bn, a, b, g in SEED_BALANCES]
    )
    erc20 = pd.DataFrame(
        [{"address": a, "block_number": bn, "total_supply": ts, "decimals": d, "name": n}
         for a, bn, ts, d, n in ERC20_REGISTRY]
    )
    return {
        "block_headers_raw": pd.DataFrame(headers),
        "transactions": pd.DataFrame(txs),
        "transaction_receipts": pd.DataFrame(receipts),
        "receipt_logs": pd.DataFrame(logs),
        "transfer_logs": pd.DataFrame(
            tlogs, columns=["block_number", "tx_hash", "from", "to", "value"]
        ),
        "subscriptions": subs,
        "seed_balances": seed,
        "erc20": erc20,
    }


def truth_balancer(blocks=BLOCKS):
    """Chain-truth balance lookup — the node side of the balancer seam
    (client/balancer.go:43-116): balance(token, address) as-of the request
    row's ``block_number`` = Σ ledger deltas ≤ that block, from the golden
    model. New subscriptions have no seed rows (the has-prev-balance guard
    forbids it), so deltas alone are the full truth."""
    deltas = expected_model(blocks)["deltas"]

    def lookup(req: pd.DataFrame) -> pd.Series:
        def bal(r):
            return str(
                sum(
                    d
                    for (t, bn, a), d in deltas.items()
                    if t == r["token"] and a == r["address"] and bn <= r["block_number"]
                )
            )

        return req.apply(bal, axis=1)

    return lookup


# ---------------------------------------------------------------------------
# Independent golden model (plain Python ints/loops — no Spark)
# ---------------------------------------------------------------------------


def expected_model(blocks=BLOCKS) -> dict[str, object]:
    registered = {t[0] for t in ERC20_REGISTRY}
    sub_group = {a: g for _, _, g, a in SUBSCRIPTIONS}

    fees: dict[tuple[int, str], int] = {}          # (block, addr) -> fee
    events = []                                     # (token, block, tx_hash, from, to, value)
    header_rewards: dict[int, dict[str, int]] = {}  # block -> reward cols

    for block in blocks:
        number, coinbase, diff, block_txs, block_logs, uncles, internals = _norm(block)
        txs_fee = 0
        for tag, f_, t_, amount, gp, gu in block_txs:
            fee = gp * gu
            txs_fee += fee
            fees[(number, f_)] = fees.get((number, f_), 0) + fee
            if amount != 0:
                events.append((ETH, number, thash(tag), f_, t_, amount))
        # internal (state-diff) ether moves: real events, no extra fee
        for tag, f_, t_, value in internals:
            events.append((ETH, number, thash(tag), f_, t_, value))
        for tag, contract, topic0, f_, t_, value in block_logs:
            if contract in registered and topic0 == TRANSFER_SIG:
                events.append((contract, number, thash(tag), f_, t_, value))
        incl = len(uncles) * BASE_REWARD // 32
        miner_total = txs_fee + BASE_REWARD + incl
        u = list(uncles) + [None, None]
        header_rewards[number] = {
            "txs_fee": txs_fee,
            "uncles_inclusion_reward": incl,
            "miner_reward": miner_total,
            "uncle1_reward": uncle_reward(number, u[0][2]) if u[0] else 0,
            "uncle2_reward": uncle_reward(number, u[1][2]) if u[1] else 0,
        }
        events.append((ETH, number, bhash(number), MINER_FROM, coinbase, miner_total))
        for tag, ucb, un in uncles:
            events.append((ETH, number, thash(tag), UNCLE_FROM, ucb, uncle_reward(number, un)))

    # ledger deltas (all addresses)
    deltas: dict[tuple[str, int, str], int] = {}
    for token, number, _txh, f_, t_, v in events:
        deltas[(token, number, t_)] = deltas.get((token, number, t_), 0) + v
        if f_ not in (MINER_FROM, UNCLE_FROM):
            deltas[(token, number, f_)] = deltas.get((token, number, f_), 0) - v
    for (number, a), fee in fees.items():
        deltas[(ETH, number, a)] = deltas.get((ETH, number, a), 0) - fee

    # snapshots for subscribed addresses
    seed_latest: dict[tuple[str, str], int] = {}
    for t, bn, a, b, g in sorted(SEED_BALANCES, key=lambda r: r[1]):
        seed_latest[(t, a)] = b
    snapshots = []  # (token, block, address, balance, group)
    running: dict[tuple[str, str], int] = dict(seed_latest)
    for (token, number, a) in sorted(deltas, key=lambda k: k[1]):
        if a not in sub_group:
            continue
        key = (token, a)
        running[key] = running.get(key, 0) + deltas[(token, number, a)]
        snapshots.append((token, number, a, running[key], sub_group[a]))

    # total balances per (token, group, block)
    gdeltas: dict[tuple[str, int, int], int] = {}
    for (token, number, a), d in deltas.items():
        if a in sub_group:
            k = (token, sub_group[a], number)
            gdeltas[k] = gdeltas.get(k, 0) + d
    totals = []  # (token, block, group, balance, tx_fee, miner_reward, uncles_reward)
    gtotal: dict[tuple[str, int], int] = {}
    for (token, group, number) in sorted(gdeltas, key=lambda k: k[2]):
        k = (token, group)
        gtotal[k] = gtotal.get(k, 0) + gdeltas[(token, group, number)]
        tx_fee = sum(
            f for (bn, a), f in fees.items()
            if bn == number and sub_group.get(a) == group
        ) if token == ETH else 0
        miner_reward = sum(
            v for tok, bn, _th, f_, t_, v in events
            if tok == ETH and bn == number and f_ == MINER_FROM and sub_group.get(t_) == group
        ) if token == ETH else 0
        uncles_reward_v = sum(
            v for tok, bn, _th, f_, t_, v in events
            if tok == ETH and bn == number and f_ == UNCLE_FROM and sub_group.get(t_) == group
        ) if token == ETH else 0
        totals.append((token, number, group, gtotal[k], tx_fee, miner_reward, uncles_reward_v))

    # total difficulty (seeded 0 at batch start)
    td, tds = 0, []
    for number, _cb, diff, *_ in blocks:
        td += diff
        tds.append((number, bhash(number), td))

    return {
        "events": events,
        "fees": fees,
        "deltas": deltas,
        "snapshots": snapshots,
        "totals": totals,
        "td": tds,
        "header_rewards": header_rewards,
    }
