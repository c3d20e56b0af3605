"""Skew mitigation for hot join/aggregation keys.

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``, on in
session.py), which splits oversized shuffle partitions at runtime. Salting is
the manual tool for the cases AQE cannot fix:

- a *single key* so hot that splitting its partition still leaves one task
  per occurrence-side, e.g. the zero-address in transfer data or an empty-
  string token — AQE splits the partition, but a broadcast/stream join of
  that one key's rows still concentrates on few tasks;
- aggregations with high-cardinality skew where two-stage (partial → final)
  combining is defeated by the key itself (e.g. ``collect_set`` per hot key).

Both helpers keep exact semantics: salting only changes physical row
placement, results are identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys and ``small`` is too large to
    broadcast: each big row gets a random salt in [0, salt); every small row
    is replicated ``salt`` times. The join key becomes (key, salt), spreading
    each hot key across ``salt`` tasks. Exact same rows out as a plain join;
    cost is |small| × salt replication — choose salt ≈ (hot-key rows /
    target-task rows).

    Supported ``how``: inner / left (the replication side must be the
    lookup side for outer semantics to hold)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    b = big.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [on, "__salt"], how).drop("__salt")


def salted_collect_set(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """``groupBy(key).agg(collect_set(value))`` with a two-stage salted
    shuffle: stage 1 collects per (key, salt) — hot keys spread over
    ``salt`` tasks — stage 2 flattens the ≤``salt`` partial sets per key.
    Identical result set; the second shuffle moves one row per (key, salt),
    not one per input row."""
    stage1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt)))
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__part"))
    )
    return (
        stage1.groupBy(key)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias(out_col))
    )
