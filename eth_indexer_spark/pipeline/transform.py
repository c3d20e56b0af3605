"""The per-batch transform pipeline: geth-shaped raw tables in, derived
tables out.

Re-expresses the reference's per-block imperative loop
(store/store.go:215-316 + store/transfer_processor.go:85-418) as a dataflow
of pure DataFrame functions over a whole batch of blocks at once. The
reference iterates block-by-block inside one DB transaction; the only step
whose semantics genuinely require block order is the cumulative carry-forward
(total balances / balance snapshots / total difficulty), and those become
windowed prefix sums per key — everything else is order-free and fully
parallel.

Arithmetic follows the uint256 policy (schema.py): DECIMAL(38,0) column math
by default, exact Python-int pandas paths where a stage may exceed 1e38
(``exact=True``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from eth_indexer_spark.functions.hexutils import abi_uint256, topic_to_address
from eth_indexer_spark.functions.rewards import (
    base_reward,
    uncle_reward,
    uncles_inclusion_reward,
)
from eth_indexer_spark.schema import (
    ERC20_TRANSFER_SIG,
    ETH_TOKEN,
    MINER_REWARD_FROM,
    UNCLE_REWARD_FROM,
)

_D = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Event extraction
# ---------------------------------------------------------------------------


def eth_transfer_events(transfer_logs: DataFrame) -> DataFrame:
    """ETH transfer events from the node's state-diff transfer logs
    (debug_getTransferLogs, client/client.go:150-154, consumed at
    service/indexer/indexer.go:443-467 and store/store.go:240-245 via
    common.EthTransferEvent, utils.go:198-208). This is the reference's ONLY
    source of ether events: it covers both top-level tx value AND ether moved
    inside contract execution, which ``tx.amount`` alone never sees."""
    return transfer_logs.select(
        F.lit(ETH_TOKEN).alias("token"),
        "block_number",
        "tx_hash",
        "from",
        "to",
        "value",
    )


def extract_eth_transfers(txs: DataFrame) -> DataFrame:
    """Fallback ETH transfer events from value-bearing transactions, for
    sources without state-diff support (a non-archive node has no
    debug_getTransferLogs). Misses internal transfers — prefer
    :func:`eth_transfer_events`. Zero-value calls carry no event but still
    pay fees (transfer_processor.go:95-97).

    The zero test is on the canonical string, not a decimal cast: amounts may
    exceed DECIMAL(38,0) (uint256 policy) and a cast would null them out."""
    return txs.filter(F.col("amount") != "0").select(
        F.lit(ETH_TOKEN).alias("token"),
        "block_number",
        F.col("hash").alias("tx_hash"),
        "from",
        "to",
        F.col("amount").alias("value"),
    )


def extract_erc20_transfers(logs: DataFrame, erc20: DataFrame) -> DataFrame:
    """P8 (store/event_erc20.go:37-62): keep logs of REGISTERED tokens whose
    topic0 is the ERC20 Transfer signature; project topics→(from,to) and
    ABI-decode data→value (exact uint256 — fixture values exceed 1e38).

    The registry is broadcast: it is the reference's in-memory token list
    (store/store.go:85,98-113)."""
    tokens = erc20.select(F.col("address").alias("contract_address")).distinct()
    return (
        logs.filter(F.col("event_name") == ERC20_TRANSFER_SIG)
        .join(F.broadcast(tokens), "contract_address", "left_semi")
        .select(
            F.col("contract_address").alias("token"),
            "block_number",
            "tx_hash",
            topic_to_address("topic1").alias("from"),
            topic_to_address("topic2").alias("to"),
            abi_uint256("data").alias("value"),
        )
    )


def reward_events(headers: DataFrame) -> DataFrame:
    """Synthetic miner/uncle reward transfer events
    (store/store.go:278-299). Miner event value = txs_fee + base + inclusion
    (= header.miner_reward, model/types.go:111-113); tx_hash = block hash.
    Uncle event value = uncle reward; tx_hash = uncle hash."""
    miner = headers.select(
        F.lit(ETH_TOKEN).alias("token"),
        F.col("number").alias("block_number"),
        F.col("hash").alias("tx_hash"),
        F.lit(MINER_REWARD_FROM).alias("from"),
        F.col("coinbase").alias("to"),
        F.col("miner_reward").alias("value"),
    )
    uncles = []
    for i in (1, 2):
        uncles.append(
            headers.filter(F.col(f"uncle{i}_hash") != "").select(
                F.lit(ETH_TOKEN).alias("token"),
                F.col("number").alias("block_number"),
                F.col(f"uncle{i}_hash").alias("tx_hash"),
                F.lit(UNCLE_REWARD_FROM).alias("from"),
                F.col(f"uncle{i}_coinbase").alias("to"),
                F.col(f"uncle{i}_reward").alias("value"),
            )
        )
    out = miner
    for u in uncles:
        out = out.unionByName(u)
    return out


def compute_header_rewards(headers: DataFrame, txs: DataFrame, receipts: DataFrame) -> DataFrame:
    """Fill the reward columns of raw headers (model/types.go:93-123 +
    common/utils.go:216-254): txs_fee = Σ gas_price×gas_used over the block,
    miner_reward = txs_fee + base + inclusion, uncleN_reward by formula.

    Raw headers here carry ``uncleN_hash``/``uncleN_coinbase``/
    ``uncleN_number`` from the fetcher; this fills the derived columns."""
    fees = (
        txs.select("hash", "gas_price", "block_number")
        .join(receipts.select(F.col("tx_hash").alias("hash"), "gas_used"), "hash")
        .groupBy("block_number")
        .agg(F.sum(F.col("gas_price").cast(_D) * F.col("gas_used").cast(_D)).alias("__fee"))
    )
    h = headers.join(
        fees.withColumnRenamed("block_number", "number"), "number", "left"
    ).withColumn("__fee", F.coalesce(F.col("__fee"), F.lit(0).cast(_D)))

    n_uncles = (F.col("uncle1_hash") != "").cast("int") + (F.col("uncle2_hash") != "").cast("int")
    incl = uncles_inclusion_reward(F.col("number"), n_uncles)
    miner = F.col("__fee") + base_reward(F.col("number")) + incl
    u1 = F.when(
        F.col("uncle1_hash") != "", uncle_reward(F.col("number"), F.col("uncle1_number"))
    ).otherwise(F.lit(0).cast(_D))
    u2 = F.when(
        F.col("uncle2_hash") != "", uncle_reward(F.col("number"), F.col("uncle2_number"))
    ).otherwise(F.lit(0).cast(_D))
    return (
        h.withColumn("txs_fee", F.col("__fee").cast("string"))
        .withColumn("uncles_inclusion_reward", incl.cast("string"))
        .withColumn("miner_reward", miner.cast("string"))
        .withColumn("uncle1_reward", u1.cast("string"))
        .withColumn("uncle2_reward", u2.cast("string"))
        .drop("__fee")
    )


# ---------------------------------------------------------------------------
# Fees / changed addresses / subscription joins
# ---------------------------------------------------------------------------


def tx_fees(txs: DataFrame, receipts: DataFrame) -> DataFrame:
    """A5 (transfer_processor.go:224-249): fee = gas_price × gas_used per
    sender per block. The reference zips txs↔receipts positionally with a
    hash consistency check (J6); distributed form is an equi-join on
    tx_hash — order-independent and safe under partitioning."""
    return (
        txs.select("hash", "block_number", "from", "gas_price")
        .join(receipts.select(F.col("tx_hash").alias("hash"), "gas_used"), "hash")
        .groupBy("block_number", F.col("from").alias("address"))
        .agg(F.sum(F.col("gas_price").cast(_D) * F.col("gas_used").cast(_D)).alias("fee"))
    )


def changed_addresses(txs: DataFrame, events: DataFrame) -> DataFrame:
    """A4 (transfer_processor.go:92-119): distinct addresses touched this
    batch = tx senders ∪ event froms (except reward sentinels) ∪ event tos.
    One column ``address`` plus ``block_number`` (needed per-block downstream)."""
    senders = txs.select("block_number", F.col("from").alias("address"))
    froms = events.filter(
        ~F.col("from").isin(MINER_REWARD_FROM, UNCLE_REWARD_FROM)
    ).select("block_number", F.col("from").alias("address"))
    tos = events.select("block_number", F.col("to").alias("address"))
    return senders.unionByName(froms).unionByName(tos).distinct()


def subscribed_events(events: DataFrame, subs: DataFrame) -> DataFrame:
    """J5 (transfer_processor.go:163-177): keep events where from OR to is a
    subscribed address; the subscription set is broadcast (it is the
    reference's in-memory map probe).

    Single pass, no dedup: two broadcast hash left-joins attach from/to
    membership markers and one filter keeps the OR. Genuine duplicate events
    (two identical-value transfers in one tx) survive — a union+distinct
    would collapse them, and a semi-join with an OR condition would plan as
    a nested-loop join instead of two hash probes."""
    addrs = subs.select("address").distinct()
    sf = F.broadcast(addrs.select(F.col("address").alias("__from_sub")))
    st = F.broadcast(addrs.select(F.col("address").alias("__to_sub")))
    return (
        events.join(sf, events["from"] == F.col("__from_sub"), "left")
        .join(st, events["to"] == F.col("__to_sub"), "left")
        .filter(F.col("__from_sub").isNotNull() | F.col("__to_sub").isNotNull())
        .drop("__from_sub", "__to_sub")
    )


# ---------------------------------------------------------------------------
# Ledger deltas → balance snapshots (the balancer stand-in: state derived
# from our own ledger instead of a geth RPC; see sources/chain.py for the
# batched-RPC-shaped variant)
# ---------------------------------------------------------------------------


def ledger_deltas(
    events: DataFrame, fees: DataFrame | None = None, exact: bool | None = None
) -> DataFrame:
    """Per-(token, address, block) balance delta implied by the ledger:
    Σ incoming − Σ outgoing − fees (ETH only). Reward sentinels never appear
    as debit rows (they are not accounts).

    Arithmetic path is chosen per batch (uint256 policy, schema.py):

    - **fast path** (the overwhelmingly common case): when no value in the
      batch exceeds 30 digits, sums run as JVM DECIMAL(38,0) aggregation —
      whole-stage codegen with map-side partial aggregation, no Python.
      The 30-digit guard leaves 8 digits of headroom, so any group of up to
      10^8 rows is provably overflow-free (real wei values are ≤ 27 digits).
    - **exact path**: any larger value routes the whole batch through the
      Arrow-batched grouped pandas aggregation on Python ints.

    ``exact``: force a path (tests); None = detect (one cheap scan probe).
    """
    credit = events.select(
        "token", "block_number", F.col("to").alias("address"), F.col("value").alias("signed")
    )
    debit = events.filter(
        ~F.col("from").isin(MINER_REWARD_FROM, UNCLE_REWARD_FROM)
    ).select(
        "token",
        "block_number",
        F.col("from").alias("address"),
        F.concat(F.lit("-"), F.col("value")).alias("signed"),
    )
    parts = credit.unionByName(debit)
    if fees is not None:
        parts = parts.unionByName(
            fees.select(
                F.lit(ETH_TOKEN).alias("token"),
                "block_number",
                "address",
                F.concat(F.lit("-"), F.col("fee").cast("string")).alias("signed"),
            )
        )

    if exact is None:
        digits = F.length(F.regexp_replace("signed", "-", ""))
        exact = parts.filter(digits > 30).limit(1).count() > 0

    if not exact:
        return (
            parts.groupBy("token", "block_number", "address")
            .agg(F.sum(F.col("signed").cast(_D)).cast("string").alias("delta"))
        )

    def _sum_group(pdf: pd.DataFrame) -> pd.DataFrame:
        total = sum(int(v) for v in pdf["signed"])
        head = pdf.iloc[0]
        return pd.DataFrame(
            {
                "token": [head["token"]],
                "block_number": [head["block_number"]],
                "address": [head["address"]],
                "delta": [str(total)],
            }
        )

    return parts.groupBy("token", "block_number", "address").applyInPandas(
        _sum_group, "token string, block_number long, address string, delta string"
    )


def _any_over_30_digits(df: DataFrame, col: str) -> bool:
    """The uint256 fast-path probe (shared with ledger_deltas): 30 digits
    leaves 8 digits of headroom in DECIMAL(38,0), so any prefix sum of up to
    10^8 such values is provably overflow-free."""
    digits = F.length(F.regexp_replace(col, "-", ""))
    return df.filter(digits > 30).limit(1).count() > 0


def balance_snapshots(
    deltas: DataFrame,
    subs: DataFrame,
    seed_balances: DataFrame | None = None,
    exact: bool | None = None,
) -> DataFrame:
    """Sparse per-(token, address, block) balance snapshots for SUBSCRIBED
    addresses: seed (latest stored balance before the batch) + running sum of
    deltas, one row per block where the balance changed — the shape of the
    reference's ``accounts`` / ``erc20_balance_<token>`` rows
    (transfer_processor.go:258-313).

    uint256 policy: when every delta and seed fits 30 digits (the
    overwhelmingly common case) the running sum is a JVM window prefix sum
    over DECIMAL(38,0) — whole-stage codegen, no Python; otherwise the exact
    grouped-pandas path on Python ints. ``exact``: force a path (tests);
    None = probe."""
    subs_b = F.broadcast(subs.select("address", "group"))
    d = deltas.join(subs_b, "address")  # inner: only subscribed addresses

    if seed_balances is not None:
        # latest stored balance per (token, address) — J1 on the seed table;
        # without this reduction a multi-row seed would fan out the deltas
        w = W.partitionBy("token", "address").orderBy(F.desc("block_number"))
        seed = (
            seed_balances.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("token", "address", F.col("balance").alias("__seed"))
        )
        d = d.join(seed, ["token", "address"], "left")
    else:
        d = d.withColumn("__seed", F.lit(None).cast("string"))

    if exact is None:
        exact = _any_over_30_digits(deltas, "delta") or (
            seed_balances is not None and _any_over_30_digits(seed_balances, "balance")
        )

    if not exact:
        cum = W.partitionBy("token", "address").orderBy("block_number").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        return d.select(
            "token",
            "block_number",
            "address",
            (
                F.coalesce(F.col("__seed").cast(_D), F.lit(0).cast(_D))
                + F.sum(F.col("delta").cast(_D)).over(cum)
            ).cast("string").alias("balance"),
            "group",
        )

    def _cumsum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("block_number")
        seed_vals = pdf["__seed"].dropna()
        running = int(seed_vals.iloc[0]) if len(seed_vals) else 0
        out = []
        for _, row in pdf.iterrows():
            running += int(row["delta"])
            out.append(str(running))
        return pd.DataFrame(
            {
                "token": pdf["token"],
                "block_number": pdf["block_number"],
                "address": pdf["address"],
                "balance": out,
                "group": pdf["group"],
            }
        )

    return d.groupBy("token", "address").applyInPandas(
        _cumsum,
        "token string, block_number long, address string, balance string, group long",
    )


# ---------------------------------------------------------------------------
# Total balances (A7) and total difficulty (A10)
# ---------------------------------------------------------------------------


def total_balance_rollup(
    snapshots_deltas: DataFrame,
    fees: DataFrame,
    events: DataFrame,
    subs: DataFrame,
    prev_totals: DataFrame | None = None,
    exact: bool | None = None,
) -> DataFrame:
    """A7 (transfer_processor.go:322-416): per (token, group, block) total =
    previous total + Σ member deltas, carried forward cumulatively; ETH rows
    also record the block's member tx fees and miner/uncle rewards. The
    reference seeds each block from the n−1 row inside a sequential loop —
    here the whole batch is one windowed prefix sum per (token, group).

    ``snapshots_deltas`` = ledger_deltas joined to subscribed addresses
    (token, block_number, address, delta, group).

    uint256 policy: the group-delta aggregation and the carry-forward prefix
    sum run as JVM DECIMAL(38,0) (map-side partial agg + window sum) unless
    a delta or seed exceeds 30 digits — then the exact pandas path.
    ``exact``: force a path (tests); None = probe.
    """
    subs_b = F.broadcast(subs.select("address", "group"))

    if exact is None:
        exact = _any_over_30_digits(snapshots_deltas, "delta") or (
            prev_totals is not None and _any_over_30_digits(prev_totals, "balance")
        )

    if not exact:
        gdelta = (
            snapshots_deltas.groupBy("token", "group", "block_number")
            .agg(F.sum(F.col("delta").cast(_D)).cast("string").alias("gdelta"))
        )
    else:
        gdelta = (
            snapshots_deltas.groupBy("token", "group", "block_number")
            .applyInPandas(
                lambda pdf: pd.DataFrame(
                    {
                        "token": [pdf.iloc[0]["token"]],
                        "group": [pdf.iloc[0]["group"]],
                        "block_number": [pdf.iloc[0]["block_number"]],
                        "gdelta": [str(sum(int(v) for v in pdf["delta"]))],
                    }
                ),
                "token string, group long, block_number long, gdelta string",
            )
        )

    group_fees = (
        fees.join(subs_b, "address")
        .groupBy("group", "block_number")
        .agg(F.sum("fee").cast("string").alias("tx_fee"))
    )
    miner_r = (
        events.filter(F.col("from") == MINER_REWARD_FROM)
        .join(subs_b, events["to"] == subs_b["address"])
        .groupBy("group", "block_number")
        .agg(F.max(F.col("value").cast(_D)).cast("string").alias("miner_reward"))
    )
    uncle_r = (
        events.filter(F.col("from") == UNCLE_REWARD_FROM)
        .join(subs_b, events["to"] == subs_b["address"])
        .groupBy("group", "block_number")
        .agg(F.sum(F.col("value").cast(_D)).cast("string").alias("uncles_reward"))
    )

    if prev_totals is not None:
        seed = prev_totals.select("token", "group", F.col("balance").alias("__seed"))
        gdelta = gdelta.join(seed, ["token", "group"], "left")
    else:
        gdelta = gdelta.withColumn("__seed", F.lit(None).cast("string"))

    if not exact:
        cum = W.partitionBy("token", "group").orderBy("block_number").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        totals = gdelta.select(
            "token",
            "block_number",
            "group",
            (
                F.coalesce(F.col("__seed").cast(_D), F.lit(0).cast(_D))
                + F.sum(F.col("gdelta").cast(_D)).over(cum)
            ).cast("string").alias("balance"),
        )
    else:
        def _carry(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("block_number")
            seed_vals = pdf["__seed"].dropna()
            running = int(seed_vals.iloc[0]) if len(seed_vals) else 0
            out = []
            for _, row in pdf.iterrows():
                running += int(row["gdelta"])
                out.append(str(running))
            return pd.DataFrame(
                {
                    "token": pdf["token"],
                    "block_number": pdf["block_number"],
                    "group": pdf["group"],
                    "balance": out,
                }
            )

        totals = gdelta.groupBy("token", "group").applyInPandas(
            _carry, "token string, block_number long, group long, balance string"
        )

    is_eth = F.col("token") == ETH_TOKEN
    return (
        totals.join(group_fees, ["group", "block_number"], "left")
        .join(miner_r, ["group", "block_number"], "left")
        .join(uncle_r, ["group", "block_number"], "left")
        .select(
            "token",
            "block_number",
            "group",
            "balance",
            F.when(is_eth, F.coalesce(F.col("tx_fee"), F.lit("0"))).otherwise("0").alias("tx_fee"),
            F.when(is_eth, F.coalesce(F.col("miner_reward"), F.lit("0"))).otherwise("0").alias("miner_reward"),
            F.when(is_eth, F.coalesce(F.col("uncles_reward"), F.lit("0"))).otherwise("0").alias("uncles_reward"),
        )
    )


def new_token_backfill(
    balances: DataFrame, subs: DataFrame, token: str, block_number: int
) -> DataFrame:
    """A8 (store/new_erc20.go:41-175): when a token is registered at block N,
    seed ``total_balances`` for every subscription group — latest stored
    balance per subscribed address as-of N, summed per group.

    The reference pages through all subscriptions 1000 at a time
    (subLimit, new_erc20.go:35) because it fetches balances over RPC;
    deriving from the stored balance table it is one as-of reduction
    (window top-1 per address) + one exact grouped sum. Exact uint256 path:
    seeds may exceed DECIMAL(38,0)."""
    w = W.partitionBy("address").orderBy(F.desc("block_number"))
    latest = (
        balances.filter(
            (F.col("token") == token) & (F.col("block_number") <= block_number)
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .join(F.broadcast(subs.select("address")), "address", "left_semi")
    )

    def _sum_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "token": [token],
                "block_number": [block_number],
                "group": [pdf.iloc[0]["group"]],
                "balance": [str(sum(int(b) for b in pdf["balance"]))],
                "tx_fee": ["0"],
                "miner_reward": ["0"],
                "uncles_reward": ["0"],
            }
        )

    return latest.groupBy("group").applyInPandas(
        _sum_group,
        "token string, block_number long, group long, balance string, "
        "tx_fee string, miner_reward string, uncles_reward string",
    )


def total_difficulty(headers: DataFrame, seed_td: str = "0") -> DataFrame:
    """A10 (service/indexer/indexer.go:249-274): td(n) = td(parent) +
    difficulty, seeded by the stored td of the batch's parent. Within a
    linear batch this is a prefix sum over block number; difficulty sums fit
    DECIMAL(38,0) (mainnet total difficulty peaked ≈ 5.9e22)."""
    w = W.orderBy("number").rowsBetween(W.unboundedPreceding, W.currentRow)
    return headers.select(
        F.col("number").alias("block"),
        "hash",
        (F.sum(F.col("difficulty").cast(_D)).over(w) + F.lit(seed_td).cast(_D))
        .cast("string")
        .alias("td"),
    )
