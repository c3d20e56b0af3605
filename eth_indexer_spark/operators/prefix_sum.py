"""Scalable prefix sums (running totals over a total order), global and
per-group.

The reference's running total difficulty is computed one block at a time on
ingest (``td(n) = td(parent) + difficulty``, service/indexer/indexer.go:
249-274). The batch-analytics equivalent — a cumulative sum over the whole
table ordered by block number — naively needs ``Window.orderBy(k)`` with NO
partition key, which Spark executes in a single task: a non-starter at scale.

Two-phase distributed prefix sum with LITERAL-BOUNDARY bucketing instead:

1. collect ``n-1`` approximate quantile boundaries of the (numeric proxy of
   the) order key ONCE and embed them as literals — the bucket of a row is
   then a pure, deterministic expression of its key, monotone in key order;
2. per-bucket running sum via a window partitioned by the bucket column
   (one deterministic hash exchange);
3. per-bucket totals (tiny: ≤ n rows) are prefix-summed and joined back as
   broadcast offsets.

Why literal boundaries and not ``repartitionByRange`` +
``spark_partition_id``: the output rows and the offsets are two consumers of
the same frame, and Spark does not exchange-reuse them (column pruning gives
the branches different plan signatures) — each would re-execute a range
exchange whose boundary SAMPLING is seeded per-execution. Two executions can
therefore partition the same rows differently, attaching offsets computed
for one partitioning to rows labeled under another: silently wrong sums the
moment the sampler stops being exhaustive. A bucket computed from literals
is identical in every branch, every retry, every re-run, by construction.
(Same design as the literal-centroid k-means assignment in
operators/clustering.py.)

The value is summed in DECIMAL so the result is exact and independent of
bucketing — required for oracle comparison and for uint256-style amounts.
Skewed keys cost bucket balance, never correctness: duplicate quantile
boundaries just merge buckets.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_BKT = "__ps_bucket"


def _bucket_expr(df: DataFrame, proxy: Column, n: int) -> Column:
    """Bucket in [0, n): the count of literal quantile boundaries strictly
    below the row's proxy value. One tiny driver-side job collects the
    boundaries; after that the bucket is a pure codegen'd expression —
    deterministic across branches, retries, and re-runs."""
    row = df.select(
        F.percentile_approx(
            proxy, [i / n for i in range(1, n)], 10_000
        ).alias("b")
    ).first()
    bounds = [b for b in ((row["b"] if row else None) or []) if b is not None]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (proxy > F.lit(b)).cast("int")
    # NULL proxy → bucket -1: nulls sort FIRST in the total order (matching
    # window NULLS-FIRST ordering) instead of nulling the bucket, which
    # would both drop the rows at the inner offsets join and leak their
    # values into every real bucket's offset
    return F.coalesce(bucket, F.lit(-1))


def global_running_sum(
    df: DataFrame,
    order_key: str,
    value_col,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    order_proxy: Column | None = None,
    reuse_upstream: bool = False,
) -> DataFrame:
    """Append ``out_col`` = cumulative sum of ``value_col`` over the total
    order given by (unique) ``order_key``. ``value_col`` may be a Column
    expression; cast it to DecimalType for exact accumulation.

    ``order_proxy``: a NUMERIC expression monotone non-decreasing in the
    order key, used only for bucket-boundary estimation; defaults to the
    order key itself (which must then be numeric). String keys built from a
    hash (see sampling.shuffle_order) pass e.g. the first 15 hex digits as
    an integer.

    ``reuse_upstream``: the boundary job, the output rows, and the offsets
    each execute the upstream lineage (correctness never depends on this —
    buckets are literal — but recomputing an expensive lineage three times
    is wasted work). Pass True to persist the source MEMORY_AND_DISK; the
    cache entry lives until the session clears it, so leave False for bare
    scans."""
    n = int(num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    proxy = order_proxy if order_proxy is not None else F.col(order_key)
    src = df.withColumn(
        "__ps_val", value_col if not isinstance(value_col, str) else F.col(value_col)
    )
    if reuse_upstream:
        src = src.persist(StorageLevel.MEMORY_AND_DISK)
    bucketed = src.withColumn(_BKT, _bucket_expr(src, proxy, n))

    w_local = (
        W.partitionBy(_BKT).orderBy(order_key).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = bucketed.withColumn("__ps_local", F.sum("__ps_val").over(w_local))

    # per-bucket totals → exclusive prefix offsets (≤ n rows; the
    # unpartitioned window is a single task over that tiny frame only)
    w_off = W.orderBy(_BKT).rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    offsets = (
        bucketed.groupBy(_BKT)
        .agg(F.sum("__ps_val").alias("__ps_total"))
        .withColumn("__ps_offset", F.coalesce(F.sum("__ps_total").over(w_off), F.lit(0)))
        .select(_BKT, "__ps_offset")
    )

    return (
        local.join(F.broadcast(offsets), _BKT)
        .withColumn(out_col, F.col("__ps_local") + F.col("__ps_offset"))
        .drop(_BKT, "__ps_val", "__ps_local", "__ps_offset")
    )


def grouped_running_sum(
    df: DataFrame,
    group_key: str,
    order_cols,
    value_col,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    order_proxy: Column | None = None,
    reuse_upstream: bool = False,
) -> DataFrame:
    """Per-group cumulative sum of ``value_col`` in ``order_cols`` order —
    the grouped sibling of :func:`global_running_sum`, for when the group
    cardinality is LOW (sources, languages, shards). A plain
    ``Window.partitionBy(group)`` puts each group's entire history in ONE
    task, so with 5 sources a 100 TB scan runs 5 reducers; here every group
    spreads across all ``n`` literal-boundary buckets of the order key (the
    window partitions by ``(bucket, group)``), and per-(bucket, group)
    totals — at most n × #groups tiny rows — are offset-summed along each
    group's bucket sequence and broadcast back. For HIGH-cardinality groups
    the plain window is already parallel and cheaper; use it instead.

    ``order_cols`` is a list of columns/Column expressions forming a total
    order within each group; ``order_proxy`` is the numeric boundary proxy
    for the FIRST of them (monotone in it — see
    :func:`global_running_sum`), defaulting to that column itself.
    ``reuse_upstream`` as in :func:`global_running_sum`. DECIMAL the value
    for exact, bucketing-independent accumulation."""
    n = int(num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    proxy = order_proxy if order_proxy is not None else order_cols[0]
    src = df.withColumn(
        "__ps_val", value_col if not isinstance(value_col, str) else F.col(value_col)
    )
    if reuse_upstream:
        src = src.persist(StorageLevel.MEMORY_AND_DISK)
    # boundaries of the order key alone: globally monotone ⇒ monotone within
    # every group, which is all the per-group offset chaining needs
    bucketed = src.withColumn(_BKT, _bucket_expr(src, proxy, n))

    w_local = (
        W.partitionBy(_BKT, group_key)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = bucketed.withColumn("__ps_local", F.sum("__ps_val").over(w_local))

    # per-(bucket, group) totals → exclusive offsets along each group's
    # bucket sequence; the totals frame is tiny, so its window is cheap
    w_off = (
        W.partitionBy(group_key).orderBy(_BKT).rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    )
    offsets = (
        bucketed.groupBy(_BKT, group_key)
        .agg(F.sum("__ps_val").alias("__ps_total"))
        .withColumn("__ps_offset", F.coalesce(F.sum("__ps_total").over(w_off), F.lit(0)))
        .select(_BKT, group_key, "__ps_offset")
    )

    return (
        local.join(F.broadcast(offsets), [_BKT, group_key])
        .withColumn(out_col, F.col("__ps_local") + F.col("__ps_offset"))
        .drop(_BKT, "__ps_val", "__ps_local", "__ps_offset")
    )
