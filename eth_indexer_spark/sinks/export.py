"""Training-shard export: the last stage of a curation pipeline — write the
curated corpus as N deterministic shards in epoch-shuffle order, the layout
a training data-loader consumes (contiguous global-order blocks, one file
per shard; Megatron/WebDataset-style sharding).

Design:

- **Order** comes from :func:`~eth_indexer_spark.operators.sampling.
  shuffle_order` (md5-ranked distributed prefix sum) unless the caller
  already carries a position column — so a re-export of the same corpus
  produces byte-identical shard membership and in-shard order (resumable
  training needs the epoch order to be a pure function of the data).
- **Shard assignment** is exact, not sampled: ``shard = floor((pos-1) *
  num_shards / N)`` gives contiguous global-order blocks whose sizes
  differ by at most 1. (``repartitionByRange`` would sample boundaries —
  close to balanced but not reproducible row-for-row across runs.)
- **Layout**: one shuffle hash-partitioned on the shard id, rows sorted by
  position within each task, written ``partitionBy("shard")`` — exactly
  one file per shard directory, rows in training order inside the file.
  At 100 TB you export thousands of shards, so the one shuffle's
  parallelism is the shard count — the natural unit of write parallelism.
- A ``_EXPORT_MANIFEST.json`` records ``num_shards`` / ``total_rows`` /
  ``format`` so the loader (and :func:`read_shard`) never has to infer the
  layout from directory listings.

The reference's sink surface is row-store tables (store/store.go); shard
export is the training-pipeline-native sink the brief adds on top.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_indexer_spark.operators._persist import (
    _is_cached,
    persist_bounded,
    release_persisted,
)

MANIFEST = "_EXPORT_MANIFEST.json"


def export_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str,
    fmt: str = "parquet",
    pos_col: str | None = None,
) -> dict:
    """Write ``df`` as ``num_shards`` deterministic training shards under
    ``path`` (``shard=<i>/`` directories, one file each, rows in epoch
    order). Returns the manifest dict. ``fmt`` is ``parquet`` or ``json``
    (JSON-lines). Pass ``pos_col`` to export an existing 1-based order
    instead of deriving the md5 epoch shuffle.

    Requires ``num_shards <= total rows`` (every shard directory must
    exist on disk — ``partitionBy`` never writes empty ones, and a loader
    iterating the manifest's ``num_shards`` must not hit a missing path).
    Reserved output names ``shard`` / ``epoch_pos`` must not collide with
    input columns."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported export format: {fmt}")
    if "shard" in df.columns or pos_col == "shard":
        raise ValueError("input must not carry a 'shard' column (reserved)")
    if "epoch_pos" in df.columns and pos_col != "epoch_pos":
        raise ValueError("input must not carry an 'epoch_pos' column (reserved)")
    derived = pos_col is None
    if derived:
        from eth_indexer_spark.operators.sampling import shuffle_order

        # NB: not "__pos" — that name is shuffle_order's internal output
        # column, and pos_col == "__pos" would be dropped by its cleanup.
        df = shuffle_order(df, id_col, pos_col="__export_pos")
        pos_col = "__export_pos"
    # one materialization serves both the validation pass and the write —
    # without it the upstream lineage re-executes per action. That is worst
    # for the derived order (the md5 prefix sum is itself multi-pass) but
    # just as real for a caller-supplied pos_col, whose upstream (often a
    # whole curation pipeline) would otherwise run twice; pin both.
    # UNLESS the caller already persisted this plan themselves: Spark's
    # CacheManager dedups by logical plan, so pooling it here would make the
    # final release evict the CALLER's cache entry out from under them (the
    # pool's shared-entry protection only covers pool-registered sites).
    # An already-cached frame needs no second pin — leave it untouched.
    pool_owned = not _is_cached(df)
    if pool_owned:
        df = persist_bounded("sinks.export.ordered", df)
    try:
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(pos_col).alias("lo"),
            F.max(pos_col).alias("hi"),
            F.count_distinct(F.col(pos_col)).alias("nd"),
        ).collect()[0]
        total = stats["n"]
        if total == 0:
            raise ValueError("cannot export an empty corpus")
        # positions must be exactly 1..total: a gapped, shifted, or
        # duplicated order (e.g. a frame filtered AFTER shuffle_order)
        # would silently write shard ids >= num_shards and/or leave holes
        # a manifest-driven loader trips over. n distinct values in
        # [1, n] ⇒ dense by pigeonhole.
        if stats["lo"] != 1 or stats["hi"] != total or stats["nd"] != total:
            raise ValueError(
                f"{pos_col!r} must be dense 1..{total}, got "
                f"[{stats['lo']}, {stats['hi']}] with {stats['nd']} distinct: "
                "re-derive the order after filtering (or drop pos_col to "
                "let the export derive it)"
            )
        if num_shards > total:
            raise ValueError(
                f"num_shards={num_shards} exceeds total rows={total}: "
                "every shard must be non-empty"
            )
        ordered = df.withColumnRenamed(pos_col, "epoch_pos")
        # exact integer arithmetic: decimal division would round HALF_UP at
        # scale 6 BEFORE floor, mis-sharding boundary rows (and pushing the
        # last row into shard == num_shards) once total reaches ~2M
        shard = F.expr(
            f"CAST(((epoch_pos - 1) * {int(num_shards)}) DIV {int(total)} AS INT)"
        )
        out = (
            ordered.withColumn("shard", shard)
            .repartition(num_shards, "shard")
            .sortWithinPartitions("shard", "epoch_pos")
        )
        writer = out.write.mode("overwrite").partitionBy("shard")
        getattr(writer, fmt)(path)
    finally:
        if pool_owned:
            release_persisted("sinks.export.ordered")
    manifest = {
        "num_shards": num_shards,
        "total_rows": total,
        "format": fmt,
        "order": "epoch_pos",
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard back in training order (what a data-loader worker reads)."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    reader = getattr(spark.read, manifest["format"])
    return (
        reader(os.path.join(path, f"shard={shard}"))
        .orderBy("epoch_pos")
    )
