"""EP3 read-path tests (plans/queries.py) over the domain fixtures — the
query semantics of store/account/account.go, block_header.go,
transaction_receipt.go, subscription.go."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_indexer_spark.pipeline import transform as tr
from eth_indexer_spark.plans import queries as q
from tests.fixtures import ETH, T1, A1, A2, A3, RAW_SCHEMAS, bhash, build_raw, thash


@pytest.fixture(scope="module")
def raw(spark):
    pdfs = build_raw()
    return {n: spark.createDataFrame(p, schema=RAW_SCHEMAS[n]) for n, p in pdfs.items()}


@pytest.fixture(scope="module")
def headers(raw):
    return tr.compute_header_rewards(
        raw["block_headers_raw"], raw["transactions"], raw["transaction_receipts"]
    )


def test_header_by_hash_and_number(headers):
    assert q.header_by_hash(headers, bhash(103)).collect()[0]["number"] == 103
    assert q.header_by_number(headers, 101).collect()[0]["hash"] == bhash(101)
    assert q.header_by_hash(headers, "ff" * 32).count() == 0


def test_latest_header_and_count(headers):
    assert q.latest_header(headers).collect()[0]["number"] == 105
    assert q.header_count(headers).collect()[0]["count"] == 6


def test_td_by_hash(headers):
    td = tr.total_difficulty(headers)
    assert int(q.td_by_hash(td, bhash(102)).collect()[0]["td"]) == 100 + 101 + 102


def test_tx_lookups(raw):
    txs = raw["transactions"]
    assert q.tx_by_hash(txs, thash("100a")).collect()[0]["block_number"] == 100
    assert q.txs_by_block_hash(txs, bhash(104)).count() == 1


def test_receipt_hydration(raw):
    """P5: receipt + ordered logs array; empty array (not null) when the tx
    has no logs (transaction_receipt.go:106-119)."""
    r = q.receipt_with_logs(
        raw["transaction_receipts"], raw["receipt_logs"], thash("101a")
    ).collect()[0]
    assert len(r["logs"]) == 2
    contracts = {lg["contract_address"] for lg in r["logs"]}
    assert T1 in contracts
    r2 = q.receipt_with_logs(
        raw["transaction_receipts"], raw["receipt_logs"], thash("100a")
    ).collect()[0]
    assert r2["logs"] == []


def test_find_account_asof(raw):
    """J2: as-of reads over sparse snapshots (account.go:64,175-185).
    A3's ETH rows sit at blocks 80 and 95 — a mid-range as-of must see the
    older row, not the latest."""
    bal = raw["seed_balances"]
    assert q.find_account(bal, ETH, A3, 90).collect()[0]["balance"] == "700"
    assert q.find_account(bal, ETH, A3).collect()[0]["balance"] == "800"
    assert q.find_account(bal, ETH, A3, 79).count() == 0
    # unknown token ⇒ empty result, not an error (per-token table semantics)
    assert q.find_account(bal, "ee" * 20, A3).count() == 0


def test_latest_accounts(raw):
    got = {
        r["address"]: (r["block_number"], r["balance"])
        for r in q.latest_accounts(raw["seed_balances"], ETH).collect()
    }
    assert got[A3] == (95, "800")
    assert got[A1] == (90, str(10**6))
    sub = q.latest_accounts(raw["seed_balances"], ETH, [A3]).collect()
    assert len(sub) == 1 and sub[0]["address"] == A3


def test_transfers_by_address(raw, headers):
    eth = tr.extract_eth_transfers(raw["transactions"])
    rows = q.transfers_by_address(eth, ETH, A1).collect()
    assert [r["block_number"] for r in rows] == sorted(
        [r["block_number"] for r in rows], reverse=True
    )
    assert all(r["from"] == A1 or r["to"] == A1 for r in rows)


def test_find_erc20(raw):
    assert q.find_erc20(raw["erc20"], T1).collect()[0]["name"] == "TokenOne"
    assert q.find_erc20(raw["erc20"], "dd" * 20).count() == 0


def test_subscription_pagination(raw):
    subs = raw["subscriptions"]
    page1 = q.list_subscriptions(subs, group=1, page=1, limit=1).collect()
    page2 = q.list_subscriptions(subs, group=1, page=2, limit=1).collect()
    assert [r["id"] for r in page1] == [1]
    assert [r["id"] for r in page2] == [2]
    assert q.list_subscriptions(subs, group=1, page=3, limit=1).count() == 0


def test_old_subscriptions_semi_join(spark, raw):
    addrs = spark.createDataFrame([(A1,), ("ff" * 20,)], "address string")
    got = {r["address"] for r in q.old_subscriptions_for(raw["subscriptions"], addrs).collect()}
    assert got == {A1}


def test_find_total_balance_asof(spark, raw, headers):
    eth = tr.extract_eth_transfers(raw["transactions"])
    rew = tr.reward_events(headers)
    events = eth.unionByName(rew)
    fees = tr.tx_fees(raw["transactions"], raw["transaction_receipts"])
    deltas = tr.ledger_deltas(events, fees)
    sd = deltas.join(F.broadcast(raw["subscriptions"].select("address", "group")), "address")
    totals = tr.total_balance_rollup(sd, fees, events, raw["subscriptions"])
    r = q.find_total_balance(totals, 102, ETH, 1).collect()[0]
    assert r["block_number"] == 102
    r_future = q.find_total_balance(totals, 10_000, ETH, 2).collect()[0]
    assert r_future["block_number"] == 104  # A3's last ETH activity (uncle reward)


def test_store_point_reads_prune_partitions(spark, tmp_path):
    """EP3 economics: the store-aware wrapper must push the derived
    block_bucket predicate into the parquet source (PartitionFilters in the
    physical plan), so a point lookup lists ONE partition directory and an
    as-of lookup only buckets <= N — the layout analog of the reference's
    indexed point SELECTs (store/block_header/block_header.go:46,
    store/account/account.go:63-64)."""
    import io
    from contextlib import redirect_stdout

    from eth_indexer_spark.sinks.store import ParquetStore

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 40)],
                "hash string, parent_hash string, number long, difficulty long",
            ),
            "total_balances": spark.createDataFrame(
                [("0xeth", n, 1, str(n * 10)) for n in range(0, 40)],
                "token string, block_number long, `group` long, balance string",
            ),
        }
    )
    sq = q.StoreQueries(store)

    def partition_filters(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan, plan
        return plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]

    point = sq.header_by_number(25)
    assert "block_bucket" in partition_filters(point)
    assert point.collect()[0]["number"] == 25

    latest = sq.latest_header()
    assert "block_bucket" in partition_filters(latest)
    assert latest.collect()[0]["number"] == 39

    asof = sq.find_total_balance(17, "0xeth", 1)
    assert "block_bucket" in partition_filters(asof)
    assert asof.collect()[0]["block_number"] == 17


def test_store_queries_snapshot_pins_batch_boundary(spark, tmp_path):
    """StoreQueries.snapshot() must pin the committed VERSION pointer:
    reads through the pinned wrapper keep answering from one batch
    boundary — including latest_header's O(top-bucket) path and the as-of
    lookup — even after the live store advances, while partition pruning
    (the EP3 economics) is preserved."""
    from eth_indexer_spark.sinks.store import ParquetStore

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)

    def batch(numbers):
        return {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in numbers],
                "hash string, parent_hash string, number long, difficulty long",
            ),
            "total_balances": spark.createDataFrame(
                [("0xeth", n, 1, str(n * 10)) for n in numbers],
                "token string, block_number long, `group` long, balance string",
            ),
        }

    store.write_blocks(batch(range(0, 20)), block_range=(0, 19))
    pinned = q.StoreQueries(store).snapshot()
    store.write_blocks(batch(range(20, 40)), block_range=(20, 39))

    # pinned wrapper still answers from the first batch...
    assert pinned.latest_header().collect()[0]["number"] == 19
    assert pinned.header_by_number(25).count() == 0
    assert (
        pinned.find_total_balance(39, "0xeth", 1).collect()[0]["block_number"] == 19
    )
    # ...while a fresh snapshot sees the advanced boundary
    live = q.StoreQueries(store).snapshot()
    assert live.latest_header().collect()[0]["number"] == 39
    assert live.header_by_number(25).count() == 1


def test_store_queries_naive_read_detects_reorg_rewind(spark, tmp_path):
    """Default-on race detection for the EP3 surface (r7 verdict #2): a
    NAIVE consumer — takes StoreQueries.snapshot(), runs a plain
    ``.collect()``/``.count()``/``.toPandas()`` on the returned frame, never
    heard of guard() — must get SnapshotRetractedError when a reorg rewound
    the boundary below the pin, not silently-retracted rows. Forward
    progress without a rewind must NOT trip it."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)

    def batch(numbers):
        return {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in numbers],
                "hash string, parent_hash string, number long, difficulty long",
            ),
            "total_balances": spark.createDataFrame(
                [("0xeth", n, 1, str(n * 10)) for n in numbers],
                "token string, block_number long, `group` long, balance string",
            ),
        }

    store.write_blocks(batch(range(0, 20)), block_range=(0, 19))
    pinned = q.StoreQueries(store).snapshot()

    latest = pinned.latest_header()
    asof = pinned.find_total_balance(15, "0xeth", 1)
    point = pinned.header_by_number(7)
    # the snapshot surface hands back guarded frames that are still real
    # DataFrames (composable, explainable)
    for frame in (latest, asof, point):
        assert isinstance(frame, GuardedDataFrame)
    assert latest.collect()[0]["number"] == 19  # healthy pin: reads pass
    assert point.count() == 1

    # pure forward progress (no rewind) never trips the naive reader
    store.write_blocks(batch(range(20, 30)), block_range=(20, 29))
    assert latest.collect()[0]["number"] == 19
    assert asof.toPandas()["block_number"].iloc[0] == 15

    # reorg: retraction rewinds the published boundary below the pin —
    # every naive terminal action on the already-returned frames raises
    store.retract_blocks(10, 29, tables=("block_headers", "total_balances"))
    with pytest.raises(SnapshotRetractedError):
        latest.collect()
    with pytest.raises(SnapshotRetractedError):
        asof.toPandas()
    with pytest.raises(SnapshotRetractedError):
        point.count()
    with pytest.raises(SnapshotRetractedError):
        list(point.toLocalIterator())
    # the detection also covers frames REQUESTED after the rewind from the
    # same stale pin (the pin itself is invalid, not just its old frames)
    with pytest.raises(SnapshotRetractedError):
        pinned.latest_header().collect()

    # recovery path: a fresh snapshot reads cleanly
    fresh = q.StoreQueries(store).snapshot()
    assert fresh.latest_header().collect()[0]["number"] == 9

    # live (unpinned) StoreQueries stays unguarded — there is no pin to
    # invalidate, and its reads track the moving store by design
    live_frame = q.StoreQueries(store).latest_header()
    assert not isinstance(live_frame, GuardedDataFrame)
    assert live_frame.collect()[0]["number"] == 9


def test_guarded_frame_transformations_propagate_guard(spark, tmp_path):
    """Guard propagation through composition (r8 verdict #3/#4): a caller
    that takes a snapshot frame, composes further (`filter`/`select`/
    `withColumn`/`join`/`limit`/`orderBy`/...), and THEN acts must still get
    SnapshotRetractedError after a rewind — transformations re-wrap instead
    of silently downgrading to plain DataFrames."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 20)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 19),
    )
    pinned = q.StoreQueries(store).snapshot()
    base = pinned.headers_in_range(0, 19)

    composed = (
        base.filter(F.col("number") >= 5)
        .select("hash", "number", "difficulty")
        .withColumn("gas", F.col("difficulty") * 2)
        .orderBy(F.col("number").desc())
        .limit(5)
    )
    joined = base.select("number").join(
        composed.select("number", "gas"), "number"
    )
    dedup = base.select("difficulty").distinct()
    for frame in (composed, joined, dedup):
        assert isinstance(frame, GuardedDataFrame), type(frame)
    # healthy pin: composed reads pass and compute the right answer
    assert composed.count() == 5
    assert joined.count() == 5
    top = composed.collect()[0]
    assert top["number"] == 19 and top["gas"] == 2 * 119

    # reorg rewind below the pin: every DERIVED frame's action raises
    store.retract_blocks(10, 19, tables=("block_headers",))
    for frame in (composed, joined, dedup):
        with pytest.raises(SnapshotRetractedError):
            frame.collect()
    with pytest.raises(SnapshotRetractedError):
        composed.where(F.col("gas") > 0).count()  # compose-after-rewind too


def test_store_queries_over_logstore_prevents_reorg_rewind_race(spark, tmp_path):
    """The EP3 query surface is backend-agnostic through the StoreBackend
    seam (sinks/backend.py): the SAME StoreQueries code over the MVCC
    LogStore gets PREVENTION instead of detection — a snapshot pins an
    immutable file set, so a reorg retraction landing mid-read changes
    nothing the pinned reader can observe, and naive terminal actions keep
    returning the pinned state with no error. This is the reference's MySQL
    read-transaction guarantee (store/store.go:115-173) supplied by the
    backend rather than by guard brackets."""
    from eth_indexer_spark.sinks.logstore import LogStore

    store = LogStore(spark, str(tmp_path / "logstore"))

    def batch(numbers):
        return {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in numbers],
                "hash string, parent_hash string, number long, difficulty long",
            ),
            "total_balances": spark.createDataFrame(
                [("0xeth", n, 1, str(n * 10)) for n in numbers],
                "token string, block_number long, `group` long, balance string",
            ),
        }

    store.write_blocks(batch(range(0, 20)), block_range=(0, 19))
    pinned = q.StoreQueries(store).snapshot()

    latest = pinned.latest_header()
    asof = pinned.find_total_balance(15, "0xeth", 1)
    point = pinned.header_by_number(7)
    assert latest.collect()[0]["number"] == 19
    assert point.count() == 1

    # reorg rewind lands while the pin is open: retraction + replacement
    store.retract_blocks(10, 19, tables=("block_headers", "total_balances"))
    store.write_blocks(batch(range(10, 16)), block_range=(10, 15))

    # the pinned reader never observes it — same answers, no error, both on
    # already-returned frames and on frames requested after the rewind
    assert latest.collect()[0]["number"] == 19
    assert asof.toPandas()["block_number"].iloc[0] == 15
    assert point.count() == 1
    assert pinned.latest_header().collect()[0]["number"] == 19

    # a fresh pin sees the post-reorg chain
    fresh = q.StoreQueries(store).snapshot()
    assert fresh.latest_header().collect()[0]["number"] == 15
    assert fresh.header_by_number(18).count() == 0


def test_guarded_groupby_agg_raises_on_rewind(spark, tmp_path):
    """r9 verdict #3: `groupBy(...).agg(...)` was the last COMMON
    composition that silently dropped the guard (GroupedData leaves the
    DataFrame type). GuardedGroupedData closes it: aggregates, counts and
    pivots derived from a pinned frame raise SnapshotRetractedError when a
    reorg rewind lands under the pin."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        GuardedGroupedData,
        ParquetStore,
        SnapshotRetractedError,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 20)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 19),
    )
    pinned = q.StoreQueries(store).snapshot()
    base = pinned.headers_in_range(0, 19)

    grouped = base.withColumn("bucket", F.col("number") % 2).groupBy("bucket")
    assert isinstance(grouped, GuardedGroupedData)
    agged = grouped.agg(F.sum("difficulty").alias("d"))
    counted = base.groupBy((F.col("number") % 3).alias("m")).count()
    rolled = base.rollup("number").agg(F.max("difficulty").alias("d"))
    pivoted = (
        base.withColumn("par", F.col("number") % 2)
        .groupBy("par")
        .pivot("par", [0, 1])
        .agg(F.count(F.lit(1)))
    )
    for frame in (agged, counted, rolled, pivoted):
        assert isinstance(frame, GuardedDataFrame), type(frame)
    # healthy pin: the grouped plans compute the right answers
    assert {r["bucket"]: r["d"] for r in agged.collect()} == {
        0: sum(100 + n for n in range(0, 20, 2)),
        1: sum(100 + n for n in range(1, 20, 2)),
    }
    assert counted.count() == 3
    assert rolled.count() == 21  # 20 groups + grand total

    # reorg rewind below the pin: every grouped derivation raises
    store.retract_blocks(10, 19, tables=("block_headers",))
    for frame in (agged, counted, rolled, pivoted):
        with pytest.raises(SnapshotRetractedError):
            frame.collect()
    # compose-after-rewind through the grouped seam raises too
    with pytest.raises(SnapshotRetractedError):
        base.groupBy("number").agg(F.count("*").alias("c")).count()


def test_cross_snapshot_join_guards_both_pins(spark, tmp_path):
    """r9 ADVICE (low): a join/union of frames pinned to DIFFERENT
    snapshots used to keep only the LEFT guard — a rewind invalidating the
    right pin passed silently. The composite guard brackets actions with
    BOTH pins, so a rewind on EITHER store raises."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
    )

    def mkstore(name, n):
        st = ParquetStore(spark, str(tmp_path / name), bucket_size=10)
        st.write_blocks(
            {
                "block_headers": spark.createDataFrame(
                    [(f"{name}{i}", f"{name}{i-1}", i, 100 + i) for i in range(n)],
                    "hash string, parent_hash string, number long, difficulty long",
                )
            },
            block_range=(0, n - 1),
        )
        return st

    left_store, right_store = mkstore("l", 20), mkstore("r", 20)
    left = q.StoreQueries(left_store).snapshot().headers_in_range(0, 19)
    right = q.StoreQueries(right_store).snapshot().headers_in_range(0, 19)

    joined = left.select("number", "difficulty").join(
        right.select("number", F.col("hash").alias("rhash")), "number"
    )
    unioned = left.select("number").union(right.select("number"))
    assert isinstance(joined, GuardedDataFrame)
    assert joined.count() == 20 and unioned.count() == 40  # both pins healthy

    # rewind the RIGHT store only: the left pin is untouched, so the old
    # left-guard-only behavior would return silently — both must raise
    right_store.retract_blocks(10, 19, tables=("block_headers",))
    left.collect()  # left pin alone is still healthy
    with pytest.raises(SnapshotRetractedError):
        joined.collect()
    with pytest.raises(SnapshotRetractedError):
        unioned.count()
    # further composition off the cross-pinned frame keeps BOTH pins
    with pytest.raises(SnapshotRetractedError):
        joined.filter(F.col("number") > 0).count()


def test_guarded_na_and_stat_namespaces_propagate_guard(spark, tmp_path):
    """The df.na / df.stat namespaces were the last intermediates that left
    the DataFrame type unguarded: fill/drop/replace/crosstab now re-enter
    guarded frames, so the only remaining escape hatch is SQL over a temp
    view (documented)."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 20)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 19),
    )
    base = q.StoreQueries(store).snapshot().headers_in_range(0, 19)

    filled = base.na.fill({"difficulty": 0})
    dropped = base.na.drop()
    crossed = base.withColumn("par", F.col("number") % 2).stat.crosstab(
        "par", "par"
    )
    for frame in (filled, dropped, crossed):
        assert isinstance(frame, GuardedDataFrame), type(frame)
    assert filled.count() == 20 and dropped.count() == 20
    assert crossed.count() == 2
    # scalar stat results pass through (no frame to guard)
    assert isinstance(base.stat.corr("number", "difficulty"), float)

    store.retract_blocks(10, 19, tables=("block_headers",))
    for frame in (filled, dropped, crossed):
        with pytest.raises(SnapshotRetractedError):
            frame.collect()

def test_guard_surface_is_complete_over_dataframe_api():
    """The GuardedDataFrame docstring claims EVERY public DataFrame-
    returning method re-wraps. Pin the claim structurally: sweep the
    concrete DataFrame class's public callables and fail on any whose
    return annotation is a DataFrame (or list of them) that is not in a
    guarded category — so a pyspark upgrade that adds a new method fails
    this test instead of silently reopening the r8 silent-downgrade hole."""
    import inspect

    from eth_indexer_spark.sinks.store import GuardedDataFrame, _ConcreteDataFrame

    covered = (
        set(GuardedDataFrame._GUARDED_TRANSFORMS)
        | set(GuardedDataFrame._GUARDED_ACTION_TRANSFORMS)
        | {"groupBy", "groupby", "rollup", "cube"}  # GuardedGroupedData
    )
    # leaves the DataFrame API entirely (documented escape hatches) or is
    # an action returning non-DataFrame data
    escapes = {"pandas_api", "toPandas", "writeTo"}
    unguarded = []
    for name in dir(_ConcreteDataFrame):
        if name.startswith("_") or name in covered or name in escapes:
            continue
        attr = inspect.getattr_static(_ConcreteDataFrame, name)
        if isinstance(attr, property) or not callable(attr):
            continue
        ret = str(getattr(attr, "__annotations__", {}).get("return", ""))
        if "DataFrame" not in ret:
            continue
        if any(s in ret for s in ("Writer", "PandasOnSpark", "PandasDataFrameLike")):
            continue
        unguarded.append(f"{name} -> {ret}")
    assert not unguarded, (
        "public DataFrame-returning methods without guard propagation "
        f"(add to _GUARDED_TRANSFORMS or the documented escapes): {unguarded}"
    )


def test_extended_transforms_and_random_split_rewrap(spark, tmp_path):
    """The long tail of DataFrame-returning methods added to the guard
    surface (replace/describe/toDF/transform/randomSplit/...) re-wraps and
    raises after a rewind — not just the common composition set."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 20)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 19),
    )
    pinned = q.StoreQueries(store).snapshot()
    base = pinned.headers_in_range(0, 19)

    derived = [
        base.replace(100, 0, subset=["difficulty"]),
        base.describe("difficulty"),
        base.summary("count", "max"),
        base.toDF("h", "p", "n", "d"),
        base.transform(lambda df: df.filter(F.col("number") > 2)),
        base.agg(F.max("number").alias("m")),
        base.melt(
            ids=["hash"], values=["number"], variableColumnName="k",
            valueColumnName="v",
        ),
    ]
    splits = base.randomSplit([0.5, 0.5], seed=7)
    derived.extend(splits)
    for frame in derived:
        assert isinstance(frame, GuardedDataFrame), type(frame)
    assert derived[4].count() == 17  # healthy pin: transforms still work

    store.retract_blocks(10, 19, tables=("block_headers",))
    for frame in derived:
        with pytest.raises(SnapshotRetractedError):
            frame.collect()
    # eager action-transforms bracket the job they run
    with pytest.raises(SnapshotRetractedError):
        base.localCheckpoint()


def test_composite_guard_nests_member_guards(spark, tmp_path):
    """_CompositeSnapshotGuard must NEST each member's guard(), not
    reimplement it as check-yield-check: LogSnapshot's guard translates
    mid-action FileNotFound-class failures into the named
    SnapshotExpiredError, and a cross-snapshot composition (exactly what
    the composite protects) must keep that translation instead of leaking
    a raw Java stack."""
    import os

    from eth_indexer_spark.sinks.logstore import LogStore, SnapshotExpiredError
    from eth_indexer_spark.sinks.store import _CompositeSnapshotGuard

    store = LogStore(spark, str(tmp_path / "log"))
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 10)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 9),
    )
    snap = store.snapshot()
    snap.read("block_headers")  # register the table with the pin
    other = store.snapshot()
    composite = _CompositeSnapshotGuard(snap, other)

    # delete a pinned file: a mid-action FileNotFound-class failure inside
    # the composite bracket must surface as the member's NAMED error
    meta = next(iter(snap._st.files["block_headers"].values()))
    os.remove(store._abs(meta.path))
    with pytest.raises(SnapshotExpiredError):
        with composite.guard():
            raise RuntimeError("FAILED_READ_FILE.FILE_NOT_EXIST: gone.parquet")


def test_local_iterator_mid_iteration_rewind_raises(spark, tmp_path):
    """toLocalIterator checks the pin every _ITER_CHECK_EVERY rows: a
    rewind landing mid-iteration raises within one check window instead of
    only at exhaustion (r9 verdict 'What's wrong #3' — rows already
    yielded were produced under the race with no later signal)."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 30)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 29),
    )
    pinned = q.StoreQueries(store).snapshot()
    frame = pinned.headers_in_range(0, 29).orderBy("number")
    old = GuardedDataFrame._ITER_CHECK_EVERY
    GuardedDataFrame._ITER_CHECK_EVERY = 4
    try:
        it = frame.toLocalIterator()
        seen = [next(it)["number"] for _ in range(3)]
        assert seen == [0, 1, 2]
        store.retract_blocks(20, 29, tables=("block_headers",))
        with pytest.raises(SnapshotRetractedError):
            for _ in range(10):
                next(it)
    finally:
        GuardedDataFrame._ITER_CHECK_EVERY = old

def test_sql_over_snapshots_keeps_rewind_detection(spark, tmp_path):
    """The guarded form of the SQL-over-temp-view escape hatch:
    sql_over_snapshots registers the pinned frames as views, runs the
    query, and re-wraps under the composite pin of every guarded input —
    plain SQL over the same views would return an unguarded frame that
    silently serves retracted rows."""
    from eth_indexer_spark.sinks.store import (
        GuardedDataFrame,
        ParquetStore,
        SnapshotRetractedError,
        sql_over_snapshots,
    )

    store = ParquetStore(spark, str(tmp_path / "store"), bucket_size=10)
    store.write_blocks(
        {
            "block_headers": spark.createDataFrame(
                [(f"h{n}", f"h{n-1}", n, 100 + n) for n in range(0, 20)],
                "hash string, parent_hash string, number long, difficulty long",
            )
        },
        block_range=(0, 19),
    )
    pinned = q.StoreQueries(store).snapshot()
    frame = pinned.headers_in_range(0, 19)

    top = sql_over_snapshots(
        spark,
        "SELECT number, difficulty FROM h WHERE number >= 5 "
        "ORDER BY difficulty DESC LIMIT 3",
        h=frame,
    )
    assert isinstance(top, GuardedDataFrame)
    rows = top.collect()
    assert [r["number"] for r in rows] == [19, 18, 17]

    # a join of two pins through SQL carries BOTH (composite guard)
    other = q.StoreQueries(store).snapshot().headers_in_range(0, 9)
    joined = sql_over_snapshots(
        spark,
        "SELECT a.number FROM a JOIN b USING (number)",
        a=frame,
        b=other,
    )
    assert isinstance(joined, GuardedDataFrame)
    assert joined.count() == 10

    # zero guarded inputs: plain SQL result, unchanged type
    plain = sql_over_snapshots(
        spark, "SELECT 1 AS one", x=spark.range(1).toDF("number")
    )
    assert not isinstance(plain, GuardedDataFrame)

    # rewind below the pins: both SQL-derived frames raise on action
    store.retract_blocks(10, 19, tables=("block_headers",))
    for f in (top, joined):
        with pytest.raises(SnapshotRetractedError):
            f.collect()
