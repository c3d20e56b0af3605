"""Ethash reward-schedule math as pure column expressions.

Mirrors common/utils.go:216-254 (fork-schedule base reward selection, uncle
reward formula, inclusion reward) and its application in
model/types.go:93-123. Public Ethereum constants:

- base miner reward: 5 ETH before Byzantium (block 4,370,000), 3 ETH before
  Constantinople (7,280,000), 2 ETH after;
- per-uncle reward to the uncle's coinbase: ``(8 + uncle_n − block_n) × base / 8``;
- per-uncle inclusion bonus to the miner: ``base / 32``.

All values are wei (≤ 5e18 « 1e38), so DECIMAL(38,0) column math is exact —
no UDF. Cardinality guard: ≤ 2 uncles per block (model/types.go:44-51,
ErrTooManyUncles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BYZANTIUM_BLOCK = 4_370_000
CONSTANTINOPLE_BLOCK = 7_280_000
WEI = 10**18

_D = "decimal(38,0)"


def base_reward(block_number) -> Column:
    """Fork-schedule base miner reward in wei (utils.go:221-229)."""
    n = F.col(block_number) if isinstance(block_number, str) else block_number
    return (
        F.when(n < BYZANTIUM_BLOCK, F.lit(5 * WEI).cast(_D))
        .when(n < CONSTANTINOPLE_BLOCK, F.lit(3 * WEI).cast(_D))
        .otherwise(F.lit(2 * WEI).cast(_D))
    )


def uncle_reward(block_number, uncle_number) -> Column:
    """Reward paid to one uncle's coinbase (utils.go:239-246):
    ``(8 + uncle_n − block_n) * base / 8`` — integer division, exact in
    decimal because base is divisible by 8."""
    bn = F.col(block_number) if isinstance(block_number, str) else block_number
    un = F.col(uncle_number) if isinstance(uncle_number, str) else uncle_number
    factor = (F.lit(8) + un - bn).cast(_D)
    return (factor * (base_reward(bn) / F.lit(8)).cast(_D)).cast(_D)


def uncles_inclusion_reward(block_number, n_uncles) -> Column:
    """Miner bonus for including uncles: ``n × base / 32`` (utils.go:248-252)."""
    bn = F.col(block_number) if isinstance(block_number, str) else block_number
    k = F.col(n_uncles) if isinstance(n_uncles, str) else n_uncles
    return (k.cast(_D) * (base_reward(bn) / F.lit(32)).cast(_D)).cast(_D)
