"""Scalable global prefix sum (running total over a total order).

The reference's running total difficulty is computed one block at a time on
ingest (``td(n) = td(parent) + difficulty``, service/indexer/indexer.go:
249-274). The batch-analytics equivalent — a cumulative sum over the whole
table ordered by block number — naively needs ``Window.orderBy(k)`` with NO
partition key, which Spark executes in a single task: a non-starter at scale.

Two-phase distributed prefix sum instead:

1. range-partition by the order key (one range shuffle; AQE-sized);
2. per-partition running sum via a window keyed by ``spark_partition_id()``
   — rows are already colocated, so this window is partition-local;
3. per-partition totals (tiny: one row per partition) are prefix-summed on
   the driver side of a broadcast join and added as offsets.

The value is summed in DECIMAL so the result is exact and independent of
partitioning — required for oracle comparison and for uint256-style amounts.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_PID = "__ps_pid"


def grouped_running_sum(
    df: DataFrame,
    group_key: str,
    order_cols,
    value_col,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    reuse_upstream: bool = False,
) -> DataFrame:
    """Per-group cumulative sum of ``value_col`` in ``order_cols`` order —
    the grouped sibling of :func:`global_running_sum`, for when the group
    cardinality is LOW (sources, languages, shards). A plain
    ``Window.partitionBy(group)`` puts each group's entire history in ONE
    task, so with 5 sources a 100 TB scan runs 5 reducers; here the range
    shuffle on ``(group, order…)`` spreads every group across partitions,
    the running sum is partition-local, and per-(partition, group) totals —
    at most #partitions + #groups tiny rows — are offset-summed and
    broadcast back. For HIGH-cardinality groups the plain window is already
    parallel and cheaper; use it instead.

    ``order_cols`` is a list of columns/Column expressions forming a total
    order within each group. DECIMAL the value for exact, partitioning-
    independent accumulation.

    ``reuse_upstream``: both the output rows and the offsets consume the
    ranged frame, and column pruning gives the two branches different
    range-exchange signatures, so Spark's exchange reuse does NOT
    deduplicate them — the upstream lineage runs twice. For a bare scan
    that second run is cheaper than caching (measured: persist costs ~2×
    on the running-sum benchmark query); for an upstream that itself
    carries shuffles (a dedup pipeline), pass True to persist the ranged
    frame (MEMORY_AND_DISK ≈ one extra write) instead of recomputing an
    unbounded lineage."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(int(n), F.col(group_key), *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn("__ps_val", value_col if not isinstance(value_col, str) else F.col(value_col))
    )
    w_local = (
        W.partitionBy(_PID, group_key)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = ranged.withColumn("__ps_local", F.sum("__ps_val").over(w_local))
    if reuse_upstream:  # see docstring: exchange reuse can't merge the branches
        local = local.persist(StorageLevel.MEMORY_AND_DISK)

    # per-(partition, group) totals → exclusive offsets along each group's
    # partition sequence; the totals frame is tiny, so its window is cheap
    w_off = (
        W.partitionBy(group_key).orderBy(_PID).rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    )
    offsets = (
        local.groupBy(_PID, group_key)
        .agg(F.sum("__ps_val").alias("__ps_total"))
        .withColumn("__ps_offset", F.coalesce(F.sum("__ps_total").over(w_off), F.lit(0)))
        .select(_PID, group_key, "__ps_offset")
    )

    return (
        local.join(F.broadcast(offsets), [_PID, group_key])
        .withColumn(out_col, F.col("__ps_local") + F.col("__ps_offset"))
        .drop(_PID, "__ps_val", "__ps_local", "__ps_offset")
    )


def global_running_sum(
    df: DataFrame,
    order_key: str,
    value_col,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    reuse_upstream: bool = False,
) -> DataFrame:
    """Append ``out_col`` = cumulative sum of ``value_col`` over the total
    order given by (unique) ``order_key``. ``value_col`` may be a Column
    expression; cast it to DecimalType for exact accumulation.
    ``reuse_upstream``: persist the ranged frame instead of letting the
    rows/offsets branches recompute the upstream lineage twice — see
    :func:`grouped_running_sum` for the trade-off.
    """
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(n), F.col(order_key))
        .withColumn(_PID, F.spark_partition_id())
        .withColumn("__ps_val", value_col if not isinstance(value_col, str) else F.col(value_col))
    )
    # partition-local running sum (rows already colocated by pid; the window
    # shuffle hashes on pid, moving nothing across range boundaries that AQE
    # hasn't already coalesced)
    w_local = (
        W.partitionBy(_PID).orderBy(order_key).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = ranged.withColumn("__ps_local", F.sum("__ps_val").over(w_local))
    if reuse_upstream:  # see grouped_running_sum: reuse can't merge the branches
        local = local.persist(StorageLevel.MEMORY_AND_DISK)

    # per-partition totals → exclusive prefix offsets (|partitions| rows)
    w_off = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    offsets = (
        local.groupBy(_PID)
        .agg(F.sum("__ps_val").alias("__ps_total"))
        .withColumn("__ps_offset", F.coalesce(F.sum("__ps_total").over(w_off), F.lit(0)))
        .select(_PID, "__ps_offset")
    )

    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col("__ps_local") + F.col("__ps_offset"))
        .drop(_PID, "__ps_val", "__ps_local", "__ps_offset")
    )
