"""Exact uint256 arithmetic over decimal-string columns.

The reference does all amount math in Go ``big.Int`` and persists decimal
strings (model/types.go:72-81,113-121; common/utils.go:77-83). Spark's exact
numerics stop at DECIMAL(38,0) < 2^256, so the engine uses a two-tier policy
(schema.py):

- **fast path** (default): ``CAST(x AS DECIMAL(38,0))`` column math — JVM,
  codegen, correct while |values| < 1e38 (all realistic wei magnitudes);
- **exact path** (``exact=True`` stages): Arrow-batched pandas UDFs doing
  Python-int arithmetic on the string representation — used when a stage may
  legitimately exceed 1e38 (adversarial ERC20 supplies; FIXTURES.md requires
  >1e38 test values).

Both paths treat NULL as NULL (not zero) to match SQL semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eth_indexer_spark.schema import U256_DECIMAL

# -- fast path ----------------------------------------------------------------


def u256(col) -> Column:
    """Decimal(38,0) view of a uint256 string column (fast JVM path).

    ``try_cast``, not ``cast``: under ANSI mode (Spark 4 default) a plain cast
    of an out-of-range value throws mid-job; the policy is "overflow ⇒ NULL,
    use an exact stage instead", which try_cast gives in every mode."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(U256_DECIMAL)


def u256_str(col) -> Column:
    """Back to the canonical exact-string representation."""
    return u256(col).cast("string")


# -- exact path (Arrow-batched, Python int) -----------------------------------


def _to_int(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else int(v), na_action="ignore")


@F.pandas_udf(T.StringType())
def u256_add(a: pd.Series, b: pd.Series) -> pd.Series:
    ia, ib = _to_int(a), _to_int(b)
    return pd.Series(
        [None if (x is None or y is None) else str(x + y) for x, y in zip(ia, ib)]
    )


@F.pandas_udf(T.StringType())
def u256_sub(a: pd.Series, b: pd.Series) -> pd.Series:
    ia, ib = _to_int(a), _to_int(b)
    return pd.Series(
        [None if (x is None or y is None) else str(x - y) for x, y in zip(ia, ib)]
    )


@F.pandas_udf(T.StringType())
def u256_mul(a: pd.Series, b: pd.Series) -> pd.Series:
    ia, ib = _to_int(a), _to_int(b)
    return pd.Series(
        [None if (x is None or y is None) else str(x * y) for x, y in zip(ia, ib)]
    )


@F.pandas_udf(T.StringType())
def u256_sum(v: pd.Series) -> str:
    """Grouped-agg exact sum: use inside ``groupBy().agg()``. Partial
    aggregation still applies (Spark merges per-partition pandas batches), so
    this distributes like any other agg — just off the codegen path."""
    ints = [int(x) for x in v.dropna()]
    return str(sum(ints)) if ints else None


@F.pandas_udf(T.BooleanType())
def u256_gt(a: pd.Series, b: pd.Series) -> pd.Series:
    ia, ib = _to_int(a), _to_int(b)
    return pd.Series(
        [None if (x is None or y is None) else x > y for x, y in zip(ia, ib)]
    )
