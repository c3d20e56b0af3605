"""EP3 read-path parity: the reference's library query surface as DataFrame
functions (README.md:95-113, example/main.go).

Each function takes the relevant table DataFrame(s) — loaded from the
engine's partitioned parquet catalog — and returns a DataFrame with the same
semantics as the reference's SQL. Domain-shaped golden tests live in
tests/test_queries.py against the FIXTURES.md generator.

Per-token table semantics: the reference raises no error when a token's
dynamic table is missing — queries just return empty. With the single
``token``-partitioned table, a filter on an unknown token naturally returns
an empty DataFrame, preserving that contract (SURVEY §7d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# -- block headers (store/block_header/block_header.go:44-49,89-132) ---------


def header_by_hash(headers: DataFrame, block_hash: str) -> DataFrame:
    """P1: SELECT * FROM block_headers WHERE hash = X (block_header.go:47)."""
    return headers.filter(F.col("hash") == block_hash)


def header_by_number(headers: DataFrame, number: int) -> DataFrame:
    """P2: ... WHERE number = N (block_header.go:46). With a
    block-range-partitioned layout this prunes to one partition."""
    return headers.filter(F.col("number") == number)


def latest_header(headers: DataFrame) -> DataFrame:
    """T1: ORDER BY number DESC LIMIT 1 (block_header.go:48,116-123)."""
    return headers.orderBy(F.desc("number")).limit(1)


def header_count(headers: DataFrame) -> DataFrame:
    """A1: SELECT COUNT(*) (block_header.go:49,125-132)."""
    return headers.agg(F.count(F.lit(1)).alias("count"))


def td_by_hash(td: DataFrame, block_hash: str) -> DataFrame:
    """P3: total difficulty lookup (block_header.go:45,89-96)."""
    return td.filter(F.col("hash") == block_hash)


# -- transactions (store/transaction/transaction.go:37-39,62-78) -------------


def tx_by_hash(txs: DataFrame, tx_hash: str) -> DataFrame:
    return txs.filter(F.col("hash") == tx_hash)


def txs_by_block_hash(txs: DataFrame, block_hash: str) -> DataFrame:
    return txs.filter(F.col("block_hash") == block_hash)


# -- receipts + logs hydration (transaction_receipt.go:39-40,97-120) ---------


def receipt_with_logs(receipts: DataFrame, logs: DataFrame, tx_hash: str) -> DataFrame:
    """P5: receipt row with its logs assembled into an ordered array<struct>
    column — the reference runs two point SELECTs and stitches structs in Go;
    Spark-first is a left join + ``collect_list(struct(...))``."""
    r = receipts.filter(F.col("tx_hash") == tx_hash)
    lg = (
        logs.filter(F.col("tx_hash") == tx_hash)
        .select(
            "tx_hash",
            F.struct(
                "block_number", "contract_address", "event_name",
                "topic1", "topic2", "topic3", "data",
            ).alias("log"),
        )
        .groupBy("tx_hash")
        .agg(F.collect_list("log").alias("logs"))
    )
    return r.join(lg, "tx_hash", "left").withColumn(
        "logs", F.coalesce(F.col("logs"), F.array())
    )


# -- accounts / balances (store/account/account.go:53-69,175-234) ------------


def find_account(balances: DataFrame, token: str, address: str, block_number: int | None = None) -> DataFrame:
    """J2/T2: balance as-of ``block_number`` (or latest): WHERE address=X
    [AND block_number<=N] ORDER BY block_number DESC LIMIT 1
    (account.go:63-64,175-185)."""
    df = balances.filter((F.col("token") == token) & (F.col("address") == address))
    if block_number is not None:
        df = df.filter(F.col("block_number") <= block_number)
    return df.orderBy(F.desc("block_number")).limit(1)


def latest_accounts(balances: DataFrame, token: str, addresses: list[str] | None = None) -> DataFrame:
    """J1: greatest-n-per-group — latest balance row per address. The
    reference self-joins a MAX(block_number) derived table
    (account.go:187-209); the Spark plan is one window pass."""
    df = balances.filter(F.col("token") == token)
    if addresses is not None:
        df = df.filter(F.col("address").isin(addresses))
    w = W.partitionBy("address").orderBy(F.desc("block_number"))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def transfers_by_address(transfers: DataFrame, token: str, address: str) -> DataFrame:
    """P7: transfers touching an address, newest first
    (account.go:67,223-234)."""
    return transfers.filter(
        (F.col("token") == token)
        & ((F.col("from") == address) | (F.col("to") == address))
    ).orderBy(F.desc("block_number"))


def find_erc20(erc20: DataFrame, address: str) -> DataFrame:
    """P6: token registry lookup (account.go:58,125-136)."""
    return erc20.filter(F.col("address") == address)


# -- subscriptions / total balances (store/subscription/subscription.go) -----


def list_subscriptions(subs: DataFrame, group: int, page: int, limit: int) -> DataFrame:
    """A2/T4: offset pagination ordered by id
    (subscription.go:54-58,160-205)."""
    return (
        subs.filter(F.col("group") == group)
        .orderBy("id")
        .offset((page - 1) * limit)
        .limit(limit)
    )


def new_subscriptions(subs: DataFrame, limit: int = 990) -> DataFrame:
    """block_number == 0 means "new, not yet processed"
    (subscription.go:52-54); page-limited like newSubscriptionLimit
    (transfer_processor.go:36-39)."""
    return subs.filter(F.col("block_number") == 0).orderBy("id").limit(limit)


def old_subscriptions_for(subs: DataFrame, addresses: DataFrame) -> DataFrame:
    """J4: semi-join — which of the changed addresses are subscribed
    (subscription.go:52,104-115). ``addresses`` is a 1-column DataFrame
    (``address``); broadcast because changed-addrs-per-block is small."""
    return subs.filter(F.col("block_number") > 0).join(
        F.broadcast(addresses), "address", "left_semi"
    )


def find_total_balance(total_balances: DataFrame, block_number: int, token: str, group: int) -> DataFrame:
    """J3: as-of total balance for (token, group)
    (subscription.go:61,122-129)."""
    return (
        total_balances.filter(
            (F.col("token") == token)
            & (F.col("group") == group)
            & (F.col("block_number") <= block_number)
        )
        .orderBy(F.desc("block_number"))
        .limit(1)
    )


# -- store-aware EP3 surface --------------------------------------------------


class StoreQueries:
    """EP3 point/as-of reads that ride the store's partition layout.

    The module-level functions above take caller-supplied DataFrames and
    filter logically; over a ``ParquetStore`` that prunes on ``token`` (a
    physical partition column) but NOT on ``block_bucket`` (dropped by
    ``store.read``). This wrapper derives the bucket predicate from each
    block-number filter before delegating — an equality lookup lists exactly
    one partition directory and an as-of lookup lists only buckets ≤ N,
    regardless of table size. The reference gets the same economics from the
    UNIQUE index every point SELECT rides (store/account/account.go:63-64,
    store/block_header/block_header.go:46-48); with 100 TB of history the
    difference is a one-directory listing vs a full-table scan.
    """

    def __init__(self, store) -> None:
        self.store = store

    def snapshot(self) -> "StoreQueries":
        """Pin all subsequent reads at the store's committed batch boundary
        (sinks/store.py StoreSnapshot): a multi-table read sequence — e.g.
        latest header + the balances that block implies — observes ONE
        batch, even while `write_blocks` lands the next one. This is the
        reference's per-request DB-transaction read scope
        (store/store.go:115-173) on the parquet layout.

        Rewind detection is DEFAULT-ON here: every frame the snapshot form
        returns is a :class:`~eth_indexer_spark.sinks.store.
        GuardedDataFrame`, so a plain ``.collect()``/``.toPandas()``/
        ``.count()`` by a caller that has never heard of ``guard()``
        raises :class:`~eth_indexer_spark.sinks.store.
        SnapshotRetractedError` when a reorg rewind overlaps the action,
        instead of silently returning retracted rows. Frames DERIVED from
        the returned one through the common transformations (``.filter``/
        ``.select``/``.withColumn``/joins/``limit``/``orderBy``/...) stay
        guarded — composition re-wraps. Only compositions that leave the
        DataFrame type (``groupBy().agg``, SQL over a temp view) need an
        explicit ``snapshot.guard()`` bracket."""
        return StoreQueries(self.store.snapshot())

    def _finish(self, df: DataFrame) -> DataFrame:
        """Wrap a finished answer so its terminal actions self-detect a
        reorg rewind when this instance reads through a pinned snapshot
        (live-store instances return the frame untouched — there is no pin
        to invalidate)."""
        if hasattr(self.store, "guard"):
            from eth_indexer_spark.sinks.store import GuardedDataFrame

            return GuardedDataFrame(df, self.store)
        return df

    def header_by_number(self, number: int) -> DataFrame:
        return self._finish(
            header_by_number(self.store.read_eq("block_headers", number), number)
        )

    def headers_in_range(
        self, lo: int | None = None, hi: int | None = None
    ) -> DataFrame:
        """P2 range scan through the pinned view — bucket-pruned on the
        parquet layout, log-stats-pruned on the commit-log backend."""
        return self._finish(self.store.read_range("block_headers", lo=lo, hi=hi))

    def latest_header(self) -> DataFrame:
        """T1 in O(top bucket): max_block bounds the answer (itself an
        O(bucket) top-down walk), so only the head block's rows are read —
        expressed through the StoreBackend contract alone (max_block +
        read_range), so a lakehouse backend serves it without the parquet
        layout's bucket-directory introspection."""
        top = self.store.max_block("block_headers")
        if top is None:
            return self._finish(self.store.read("block_headers").limit(0))
        return self._finish(
            latest_header(self.store.read_range("block_headers", lo=top))
        )

    def find_account(
        self, token: str, address: str, block_number: int | None = None
    ) -> DataFrame:
        balances = (
            self.store.read_range("balances", hi=block_number)
            if block_number is not None
            else self.store.read("balances")
        )
        return self._finish(find_account(balances, token, address, block_number))

    def find_total_balance(self, block_number: int, token: str, group: int) -> DataFrame:
        return self._finish(
            find_total_balance(
                self.store.read_range("total_balances", hi=block_number),
                block_number,
                token,
                group,
            )
        )
