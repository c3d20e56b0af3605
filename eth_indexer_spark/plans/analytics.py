"""Relational query registry over the driver testdata, with DuckDB oracles.

Every operator class the reference executes (SURVEY §2, file:line citations in
each query's docstring) is expressed here as an idiomatic Catalyst plan over
the TPC-H-ish proxy tables. The mapping from the reference's domain to the
proxy schema:

    address / account   → events.user_id, orders.o_custkey
    block_number        → events.event_id (unique, ordered)
    block time          → events.ts
    transfer value      → events.value
    token / event_name  → events.event_type
    subscriptions (dim) → customer / nation (small, broadcastable)

Each query is registered together with an ANSI-SQL oracle string that DuckDB
runs on the same parquet; the driver (and ``tests/test_oracle_parity.py``)
compares row count, schema, and an order-insensitive value hash.

Determinism rules used throughout (these ARE the contract with the oracle):
- double aggregates are ``round(x, 2)`` on BOTH sides (accumulation order
  differs between engines; exactness is restored by rounding);
- running/cumulative sums cast to DECIMAL first — decimal addition is exact
  and order-independent, so prefix sums compare bit-exact;
- every window order has a unique tiebreaker column (event_id / orderkey);
- every computed column is aliased identically on both sides.

Scale notes (100 TB): filters here push to the parquet scan (verified via
``explain('formatted')`` → PushedFilters), small dims are broadcast
explicitly, and aggregations are expressed so map-side partial aggregation
applies. Global-order cumulative sums are inherently sequential per chain —
the reference computes them one block at a time (indexer.go:249-274); we keep
them windowed per logical chain/group so each partition's state is bounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from eth_indexer_spark.catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query and its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship / headline aggregation (reference A5 fee-sum shape at scale:
# store/transfer_processor.go:224-249 groups value*price products per key).
# TPC-H Q1 shape: full-scan groupBy with 8 aggregates — the bench workhorse.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                       AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                  AS avg_price,
           ROUND(AVG(l_discount), 4)                                       AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1/P2 — point lookups (block_header by hash / by number:
# store/block_header/block_header.go:46-47,98-114). Partition-prunable filter.
# ---------------------------------------------------------------------------


@register(
    "p1_point_lookup",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey = 7
    """,
)
def p1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


@register(
    "p2_range_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def p2_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate + narrow projection; both reach the parquet scan."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# P7 — "transfers touching an address" (from=X OR to=X, ordered desc:
# store/account/account.go:67,223-234). OR-predicate + ordered scan.
# ---------------------------------------------------------------------------


@register(
    "p7_events_touching_user",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE user_id = 42 OR (event_type = 'purchase' AND user_id < 10)
    ORDER BY event_id DESC
    """,
)
def p7_events_touching_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("user_id") == 42) | ((F.col("event_type") == "purchase") & (F.col("user_id") < 10))
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("event_id"))
    )


# ---------------------------------------------------------------------------
# J1 — greatest-n-per-group: latest balance row per address
# (store/account/account.go:187-209 does it with a derived-table self-join
# because of MySQL ONLY_FULL_GROUP_BY; Spark-first = window row_number).
# ---------------------------------------------------------------------------


@register(
    "j1_latest_per_key",
    """
    SELECT user_id, event_id AS latest_event_id, value AS latest_value
    FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def j1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("value").alias("latest_value"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — as-of point lookup: balance at block ≤ N
# (store/account/account.go:64,175-185: ORDER BY block_number DESC LIMIT 1).
# ---------------------------------------------------------------------------


@register(
    "j2_asof_point",
    """
    SELECT user_id, event_id, value
    FROM events
    WHERE user_id = 42 AND event_id <= 5000
    ORDER BY event_id DESC
    LIMIT 1
    """,
)
def j2_asof_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("user_id") == 42) & (F.col("event_id") <= 5000))
        .select("user_id", "event_id", "value")
        .orderBy(F.desc("event_id"))
        .limit(1)
    )


@register(
    "j3_asof_all_keys",
    """
    SELECT user_id, event_id AS asof_event_id, value AS asof_value
    FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id <= 5000
    ) WHERE rn = 1
    """,
)
def j3_asof_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of snapshot for EVERY key at once (reference runs J2 per address in a
    loop; the distributed form is one windowed pass)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 5000)
    w = W.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("asof_event_id"),
            F.col("value").alias("asof_value"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — semi-join (subscribed addresses: store/subscription/subscription.go:
# 52,104-115 `WHERE address IN (…)`); J8-anti — "must have no previous row"
# (store/transfer_processor.go:295-301).
# ---------------------------------------------------------------------------


@register(
    "j4_semi_join",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.join(big, "c_custkey", "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
    )


@register(
    "j8_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def j8_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    okeys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(okeys, "c_custkey", "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J5/J6 — broadcast hash join of facts with a small dimension (the reference
# probes an in-memory map[addr]*Subscription: store/transfer_processor.go:
# 163-177; Spark-first = explicit broadcast hint).
# ---------------------------------------------------------------------------


@register(
    "j5_broadcast_dim_join",
    """
    SELECT n.n_name AS nation, ROUND(SUM(o.o_totalprice), 2) AS total_price, COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j5_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# A3/A4/A5 — aggregations (max-per-group account.go:202; distinct changed
# addresses transfer_processor.go:92-119; fee Σ gas_price*gas_used per sender
# transfer_processor.go:224-249).
# ---------------------------------------------------------------------------


@register(
    "a3_max_per_group",
    """
    SELECT user_id, MAX(event_id) AS max_event_id
    FROM events GROUP BY user_id
    """,
)
def a3_max_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("max_event_id"))
    )


@register(
    "a4_distinct_users",
    """
    SELECT DISTINCT user_id
    FROM events
    WHERE event_type <> 'error' AND user_id NOT IN (0, 1)
    """,
)
def a4_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct participants excluding sentinel pseudo-addresses (the
    reference's seen-set skips RewardToMiner/RewardToUncle, types.go:39-42)."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") != "error") & (~F.col("user_id").isin(0, 1)))
        .select("user_id")
        .distinct()
    )


@register(
    "a5_fee_sum_per_sender",
    """
    SELECT l_suppkey, ROUND(SUM(l_extendedprice * l_discount), 2) AS total_fee
    FROM lineitem GROUP BY l_suppkey
    """,
)
def a5_fee_sum_per_sender(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("total_fee"))
    )


# ---------------------------------------------------------------------------
# A7/A10 — cumulative totals (total_balances carry-forward
# transfer_processor.go:322-416; running total difficulty indexer.go:249-274).
# Decimal cast ⇒ exact, order-independent accumulation on both engines.
# ---------------------------------------------------------------------------


@register(
    "a7_cumulative_per_group",
    """
    SELECT event_type, event_id,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM events
    """,
)
def a7_cumulative_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn(
            "running_total",
            F.sum(F.col("value").cast("decimal(20,2)")).over(w).cast("double"),
        )
        .select("event_type", "event_id", "running_total")
    )


# ---------------------------------------------------------------------------
# T1/T4 — top-1 (latest header block_header.go:48,116-123) and offset
# pagination (subscription.go:54-58,160-205).
# ---------------------------------------------------------------------------


@register(
    "t1_latest_event",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events ORDER BY event_id DESC LIMIT 1
    """,
)
def t1_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("event_id"))
        .limit(1)
    )


@register(
    "t4_pagination",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer ORDER BY c_custkey LIMIT 50 OFFSET 100
    """,
)
def t4_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .offset(100)
        .limit(50)
    )
