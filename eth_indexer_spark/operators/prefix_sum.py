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

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_PID = "__ps_pid"


def global_running_sum(
    df: DataFrame,
    order_key: str,
    value_col,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = cumulative sum of ``value_col`` over the total
    order given by (unique) ``order_key``. ``value_col`` may be a Column
    expression; cast it to DecimalType for exact accumulation.
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
