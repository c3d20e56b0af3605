"""Training-shard export sink: deterministic sharding in epoch-shuffle
order, balanced shard sizes, one file per shard, loss-free round trip."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from eth_indexer_spark.catalog import load_table
from eth_indexer_spark.operators.sampling import shuffle_order
from eth_indexer_spark.sinks.export import export_training_shards, read_shard

SF = "/root/testdata/sf0.001"


def _exported_ids(spark, path, n):
    out = []
    for i in range(n):
        out.append([r["doc_id"] for r in read_shard(spark, path, i).collect()])
    return out


def test_export_shards_roundtrip_order_and_balance(spark, tmp_path):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    man = export_training_shards(d, path, 4, "doc_id")
    assert man["num_shards"] == 4 and man["total_rows"] == d.count()

    shards = _exported_ids(spark, path, 4)
    sizes = [len(s) for s in shards]
    assert sum(sizes) == man["total_rows"]
    assert max(sizes) - min(sizes) <= 1  # contiguous blocks differ by <= 1

    # exactly one data file per shard directory
    for i in range(4):
        files = glob.glob(os.path.join(path, f"shard={i}", "*.parquet"))
        assert len(files) == 1, (i, files)

    # concatenated shards reproduce the epoch shuffle order exactly
    expected = [
        r["doc_id"]
        for r in shuffle_order(d, "doc_id").orderBy("shuffle_pos").collect()
    ]
    got = [doc for s in shards for doc in s]
    assert got == expected


def test_export_shards_deterministic_and_jsonl(spark, tmp_path):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_training_shards(d, p1, 3, "doc_id")
    export_training_shards(d, p2, 3, "doc_id", fmt="json")
    a = _exported_ids(spark, p1, 3)
    b = _exported_ids(spark, p2, 3)
    assert a == b  # shard membership + order independent of format/run
    # JSON-lines files are actually line-delimited JSON
    f = glob.glob(os.path.join(p2, "shard=0", "*.json"))[0]
    with open(f) as fh:
        first = fh.readline()
    assert first.startswith("{") and first.rstrip().endswith("}")


def test_export_shards_contract_errors(spark, tmp_path):
    """Loud failures instead of silent data loss: more shards than rows
    (partitionBy would leave holes in the manifest's range), empty corpus,
    and reserved-column collisions."""
    import pytest

    from eth_indexer_spark.catalog import load_table

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="exceeds total rows"):
        export_training_shards(d, str(tmp_path / "x"), 10_000, "doc_id")
    with pytest.raises(ValueError, match="empty corpus"):
        export_training_shards(
            d.filter("doc_id < 0"), str(tmp_path / "y"), 1, "doc_id"
        )
    with pytest.raises(ValueError, match="reserved"):
        export_training_shards(
            d.withColumnRenamed("text", "shard"), str(tmp_path / "z"), 2, "doc_id"
        )
    with pytest.raises(ValueError, match="reserved"):
        export_training_shards(
            d.withColumnRenamed("text", "epoch_pos"), str(tmp_path / "w"), 2, "doc_id"
        )


def test_export_shard_assignment_is_exact_integer_floor(spark, tmp_path):
    """Shard boundaries follow exact floor((pos-1)*N/total) — decimal
    division would round HALF_UP before floor and shift boundary rows (and
    overflow the last row into shard == N at ~2M rows). Pinned via an
    existing-order export whose assignment is hand-computable."""
    rows = [(i, i) for i in range(1, 8)]  # total=7, pos 1..7
    df = spark.createDataFrame(rows, "doc_id long, mypos long")
    export_training_shards(
        df, str(tmp_path / "e"), 3, "doc_id", pos_col="mypos"
    )
    got = {
        i: [r["doc_id"] for r in read_shard(spark, str(tmp_path / "e"), i).collect()]
        for i in range(3)
    }
    # floor((pos-1)*3/7): pos 1,2,3 -> 0; 4,5 -> 1; 6,7 -> 2
    assert got == {0: [1, 2, 3], 1: [4, 5], 2: [6, 7]}


def test_export_rejects_non_dense_positions(spark, tmp_path):
    """Caller-supplied positions must be exactly 1..total: a frame filtered
    AFTER ordering (gaps, shifted max) or carrying duplicate positions
    would write shard ids >= num_shards and leave manifest-advertised
    shards missing on disk."""
    import pytest

    gapped = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 6), (4, 9), (5, 10)], "doc_id long, mypos long"
    )
    with pytest.raises(ValueError, match="dense"):
        export_training_shards(gapped, str(tmp_path / "g"), 3, "doc_id", pos_col="mypos")
    dup = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 2), (4, 4)], "doc_id long, mypos long"
    )
    with pytest.raises(ValueError, match="dense"):
        export_training_shards(dup, str(tmp_path / "d"), 4, "doc_id", pos_col="mypos")


def test_export_releases_its_persist(spark, tmp_path):
    """The derived-order persist is released after the write (and on error
    paths): export is a terminal sink, so pinning the full corpus in
    executor storage past the call would leak it for the session."""
    from eth_indexer_spark.catalog import load_table
    from eth_indexer_spark.operators import _persist

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    export_training_shards(d, str(tmp_path / "s"), 2, "doc_id")
    assert "sinks.export.ordered" not in _persist._POOL
    # error path releases too
    import pytest

    with pytest.raises(ValueError, match="exceeds total rows"):
        export_training_shards(d, str(tmp_path / "t"), 10_000, "doc_id")
    assert "sinks.export.ordered" not in _persist._POOL


def test_end_to_end_curation_to_shards(spark, tmp_path):
    """The full training-data user story in one scenario: C4 line cleaning
    → Gopher keep → exact dedup → temperature mixing → deterministic
    epoch shuffle → shard export → loader read-back. Asserts the final
    shards contain exactly the surviving doc set, in a deterministic
    order, with no duplicates — and that re-running the whole pipeline
    reproduces byte-identical shard membership."""
    from eth_indexer_spark.catalog import load_table
    from eth_indexer_spark.operators import dedup, quality
    from eth_indexer_spark.operators.sampling import temperature_mix
    from eth_indexer_spark.plans.extensions import _synthesized_lines

    def pipeline(out_path):
        d = load_table(spark, SF, "documents").select("doc_id", "text", "source")
        cleaned = quality.c4_line_filter(
            _synthesized_lines(d.select("doc_id", "text")), "text", "doc_id"
        ).withColumnRenamed("clean_text", "text")
        g = quality.gopher_rules(
            cleaned, "text", "doc_id",
            min_words=10, required_stopwords=("the", "a"),
            min_required_stopwords=1, passthrough=("text",),
        )
        kept = g.where("keep").select("doc_id", "text")
        deduped = dedup.exact_dedup(kept, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        )
        survivors = kept.join(deduped, "doc_id").join(
            d.select("doc_id", "source"), "doc_id"
        )
        mixed = temperature_mix(
            survivors, "doc_id", "source", alpha=0.5, target_fraction=0.9
        )
        # survivor set collected INDEPENDENTLY of the export (completeness
        # must not be checked against a total the sink itself derived)
        expected_ids = {r["doc_id"] for r in mixed.select("doc_id").collect()}
        man = export_training_shards(
            mixed.select("doc_id", "text"), out_path, 3, "doc_id"
        )
        return man, expected_ids

    man, expected_ids = pipeline(str(tmp_path / "run1"))
    assert man["num_shards"] == 3 and man["total_rows"] > 0

    ids1 = _exported_ids(spark, str(tmp_path / "run1"), 3)
    flat = [i for s in ids1 for i in s]
    assert len(flat) == len(set(flat)) == man["total_rows"]  # no dups
    assert set(flat) == expected_ids  # every pipeline survivor, nothing else

    pipeline(str(tmp_path / "run2"))
    assert ids1 == _exported_ids(spark, str(tmp_path / "run2"), 3)  # deterministic


def test_export_leaves_caller_cached_frame_alone(spark, tmp_path):
    """A caller who persisted the ordered frame THEMSELVES (outside the
    pool) must keep their cache entry after export: Spark's CacheManager
    dedups by logical plan, so pooling the same frame and releasing it at
    the end would silently evict the caller's cache (r8 ADVICE #1). The
    export must detect the pre-existing cache and skip the pool entirely."""
    from eth_indexer_spark.operators import _persist

    df = spark.createDataFrame(
        [(f"d{i}", f"text {i}", i + 1) for i in range(10)],
        "doc_id string, text string, mypos long",
    )
    cached = df.persist()
    try:
        cached.count()  # materialize the caller's entry
        assert _persist._is_cached(cached)
        export_training_shards(
            cached, str(tmp_path / "c"), 2, "doc_id", pos_col="mypos"
        )
        # export neither pooled it nor evicted it
        assert "sinks.export.ordered" not in _persist._POOL
        assert _persist._is_cached(cached), (
            "export evicted the caller's own cache entry"
        )
    finally:
        cached.unpersist()
