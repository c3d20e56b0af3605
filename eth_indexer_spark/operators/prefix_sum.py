"""Scalable prefix sums (running totals over a total order), global and
per-group.

The reference's running total difficulty is computed one block at a time on
ingest (``td(n) = td(parent) + difficulty``, service/indexer/indexer.go:
249-274). The batch-analytics equivalent — a cumulative sum over the whole
table ordered by block number — naively needs ``Window.orderBy(k)`` with NO
partition key, which Spark executes in a single task: a non-starter at scale.

Two-phase distributed prefix sum with LITERAL-BOUNDARY bucketing instead:

1. collect ``n-1`` approximate quantile boundaries of the (numeric proxy of
   the) order key ONCE — from a seeded SAMPLE of the input, since boundary
   quality only affects bucket balance, never correctness — and embed them
   as literals; the bucket of a row is then a pure, deterministic expression
   of its key (a ``log n``-deep comparison tree), monotone in key order;
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
boundaries just merge buckets, and a boundary list estimated from a sample
mis-sizes buckets at worst.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from eth_indexer_spark.operators._persist import persist_bounded as _pool_persist
from eth_indexer_spark.operators._persist import release_persisted as _release_persisted

_BKT = "__ps_bucket"

# Seeded fraction of the input the boundary job reads. Boundaries steer only
# bucket BALANCE (see module docstring), so estimating them from a 10% sample
# trades nothing for a ~10× cheaper per-call scan; if the sample is so small
# it yields zero boundaries, the job falls back to the full input so tiny
# frames still spread across buckets.
_BOUNDARY_SAMPLE = 0.1
_BOUNDARY_SEED = 42

# Boundary cache, keyed by (n, exprId-normalized analyzed plan, size): the
# boundary job is a full-scan Spark job whose RESULT only steers bucket
# balance — never correctness — so repeated prefix sums over the same
# lineage (benchmark reps, per-micro-batch recomputation over a slowly
# growing table, iterative pipelines) reuse the first run's boundaries
# instead of re-scanning. Stale/shared hits are possible by design — files
# replaced under the same parquet path before the size changes, or two
# same-schema in-memory frames of equal estimated size — and cost bucket
# balance at worst, never results. Bounded, LRU eviction (hits re-insert).
_BOUNDS_CACHE: dict = {}
_BOUNDS_CACHE_MAX = 64


def clear_boundary_cache() -> None:
    """Drop memoized bucket boundaries (e.g. after replacing a table's
    files in place, to restore bucket balance)."""
    _BOUNDS_CACHE.clear()

# Upstream frames persisted by reuse_upstream=True go through the shared
# bounded pool (operators/_persist): at most ONE cached frame per site, each
# new call releases the previous, so benchmark loops and long sessions never
# accumulate cache entries. Unpersisting early is always safe — buckets are
# literal, so a consumer that recomputes the lineage reproduces identical
# output.
_PERSIST_SITE = "prefix_sum.upstream"


def release_persisted() -> None:
    """Drop any upstream frame cached by ``reuse_upstream=True``."""
    _release_persisted(_PERSIST_SITE)


def _persist_bounded(src: DataFrame) -> DataFrame:
    return _pool_persist(_PERSIST_SITE, src)


def _sql_lit(b) -> str:
    """A boundary value as a SQL numeric literal (int / float / Decimal —
    the proxy contract is NUMERIC)."""
    return repr(b) if isinstance(b, float) else str(b)


def _search_sql(bounds: list, lo: int, hi: int) -> str:
    """Bucket index = count of boundaries strictly below ``__ps_proxy``, as
    a binary-search ``CASE WHEN`` tree: log n comparisons per row instead of
    the n-term chained-comparison sum (which at num_partitions ≥ 512 is pure
    wasted CPU on every row of the scan). Built as ONE SQL string — a
    Column-API tree of ~2n ``when`` nodes costs ~2n driver py4j round trips
    per prefix-sum call, which showed up as the dominant share of a10's
    per-run latency; string assembly is free and ``F.expr`` parses it in a
    single call."""
    if lo == hi:
        return str(lo)
    mid = (lo + hi) // 2
    return (
        f"(CASE WHEN __ps_proxy > {_sql_lit(bounds[mid])} "
        f"THEN {_search_sql(bounds, mid + 1, hi)} "
        f"ELSE {_search_sql(bounds, lo, mid)} END)"
    )


def _bucket_expr(df: DataFrame, n: int) -> Column:
    """Bucket in [0, n) from the staged ``__ps_proxy`` column: the count of
    literal quantile boundaries strictly below the row's proxy value. One
    tiny driver-side job over a seeded sample collects the boundaries; after
    that the bucket is a pure codegen'd expression — deterministic across
    branches, retries, and re-runs (the sample result is frozen into
    literals, so even sampling nondeterminism could only shift balance
    BETWEEN runs, never split one run's branches)."""

    def bounds_of(frame: DataFrame) -> list:
        row = frame.select(
            F.percentile_approx(
                "__ps_proxy", [i / n for i in range(1, n)], 10_000
            ).alias("b")
        ).first()
        raw = (row["b"] if row else None) or []
        # drop NaN AND ±inf: non-finite floats have no SQL literal form
        # (repr(inf) == 'inf' would parse as a column reference), and an
        # infinite boundary can never separate finite rows anyway
        return sorted(
            {
                b
                for b in raw
                if b is not None
                and not (isinstance(b, float) and not math.isfinite(b))
            }
        )

    # Cache key: the analyzed plan with attribute exprIds (#123L, fresh per
    # lineage creation) normalized away — so re-running the same logical
    # plan is a HIT — plus the optimizer's sizeInBytes, which distinguishes
    # same-shaped scans of DIFFERENT data (the plan string omits file
    # paths) and self-invalidates when a table's files change.
    import re

    analyzed = df._jdf.queryExecution().analyzed()
    plan = re.sub(r"#\d+", "#", analyzed.toString())
    size = int(analyzed.stats().sizeInBytes())  # no optimizer run needed
    key = (n, plan, size)
    bounds = _BOUNDS_CACHE.pop(key, None)
    if bounds is not None:
        _BOUNDS_CACHE[key] = bounds  # LRU touch: re-insert as most recent
    if bounds is None:
        bounds = bounds_of(df.sample(fraction=_BOUNDARY_SAMPLE, seed=_BOUNDARY_SEED))
        if not bounds:
            # sample too small to place any boundary — fall back to the full
            # input so small frames still parallelize (floor-on-rows guard)
            bounds = bounds_of(df)
        if bounds:  # never memoize "no boundaries": a stale single-bucket
            # assignment would funnel a later non-tiny input into one task
            while len(_BOUNDS_CACHE) >= _BOUNDS_CACHE_MAX:
                _BOUNDS_CACHE.pop(next(iter(_BOUNDS_CACHE)))
            _BOUNDS_CACHE[key] = bounds
    # NULL proxy → bucket -1: nulls sort FIRST in the total order (matching
    # window NULLS-FIRST ordering) instead of nulling the bucket, which
    # would both drop the rows at the inner offsets join and leak their
    # values into every real bucket's offset
    return F.expr(
        "CASE WHEN __ps_proxy IS NULL THEN -1 "
        f"ELSE {_search_sql(bounds, 0, len(bounds))} END"
    )


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
    store keeps at most ONE such entry (a new reuse_upstream call releases
    the previous), and :func:`release_persisted` drops it on demand."""
    n = int(num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    proxy = order_proxy if order_proxy is not None else F.col(order_key)
    src = df.withColumn(
        "__ps_val", value_col if not isinstance(value_col, str) else F.col(value_col)
    ).withColumn("__ps_proxy", proxy)
    if reuse_upstream:
        src = _persist_bounded(src)
    bucketed = src.withColumn(_BKT, _bucket_expr(src, n)).drop("__ps_proxy")

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

    A NULL ``group_key`` is a real group (matching the window's and
    groupBy's NULL handling): the offsets join is null-safe, so NULL-group
    rows flow through instead of silently vanishing at an equi-join that
    can never match NULL.

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
    ).withColumn("__ps_proxy", proxy)
    if reuse_upstream:
        src = _persist_bounded(src)
    # boundaries of the order key alone: globally monotone ⇒ monotone within
    # every group, which is all the per-group offset chaining needs
    bucketed = src.withColumn(_BKT, _bucket_expr(src, n)).drop("__ps_proxy")

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
        .select(
            F.col(_BKT).alias("__ps_bkt_o"),
            F.col(group_key).alias("__ps_grp_o"),
            "__ps_offset",
        )
    )

    # null-SAFE equality on the group key: a plain [_BKT, group_key] key
    # list would drop every NULL-group row here (equi-join never matches
    # NULL = NULL) even though the window above summed them
    return (
        local.join(
            F.broadcast(offsets),
            (F.col(_BKT) == F.col("__ps_bkt_o"))
            & F.col(group_key).eqNullSafe(F.col("__ps_grp_o")),
        )
        .withColumn(out_col, F.col("__ps_local") + F.col("__ps_offset"))
        .drop(_BKT, "__ps_bkt_o", "__ps_grp_o", "__ps_val", "__ps_local", "__ps_offset")
    )
