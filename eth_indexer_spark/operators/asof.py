"""As-of join: for each left row, the most recent right row at or before it.

The reference's as-of reads are per-key point SQL (``WHERE address=X AND
block_number <= N ORDER BY block_number DESC LIMIT 1``,
store/account/account.go:64,175-185, subscription.go:61,122-129). The
distributed generalization — every left row against a versioned right table —
is implemented here with the union-window pattern:

1. tag right rows 0, left rows 1, union by name;
2. one hash shuffle on the join key; within each key, order by
   (event time, tag) so a right row at the exact same timestamp sorts before
   the left row that should see it (inclusive ``>=`` semantics, matching
   DuckDB ASOF JOIN);
3. ``last(value, ignorenulls=True)`` over the running window carries the
   latest right payload forward;
4. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows, no N×M explosion, no driver loop — this is
the plan that survives a 100× scale-up (a naive per-key LIMIT-1 subquery or a
range self-join does not). Skewed keys are handled by AQE skew-join since the
shuffle is a plain hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_TAG = "__asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join (inclusive): latest right row with
    ``right_ts <= left_ts`` per ``on`` key.

    Returns every left row plus ``<value_col><suffix>`` columns (null when no
    right row precedes it).
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    out_cols = [f"{c}{suffix}" for c in value_cols]
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *keys,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        W.partitionBy(*keys)
        .orderBy("__asof_ts", _TAG)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for o in out_cols:
        unioned = unioned.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return unioned.filter(F.col(_TAG) == 1).drop(_TAG, "__asof_ts")
