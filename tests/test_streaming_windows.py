"""Event-time windowed aggregation + stateful sessionization tests: the
streaming paths are pinned to their batch ground truth (same operator code
runs both modes for windows; sessionize has an independent window-function
batch form)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from eth_indexer_spark.catalog import load_table
from eth_indexer_spark.streaming.windows import (
    sessionize,
    sessionize_batch,
    windowed_event_aggregate,
)

SF = "/root/testdata/sf0.001"

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _sig(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_windowed_agg_stream_matches_batch(spark, tmp_path):
    """availableNow file stream through the SAME operator must produce the
    batch answer (complete output mode → memory sink)."""
    events = load_table(spark, SF, "events")
    batch = windowed_event_aggregate(events, window="1 hour")

    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_aggregate(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("win_agg")
    assert _sig(got) == _sig(batch)
    assert got.count() > 0


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + timedelta(minutes=m), float(v)) for u, m, v in rows],
        "user_id long, ts timestamp, value double",
    )


SESSION_ROWS = [
    # u1: session A (0, 10, 25) → gap 60min → session B (85) → gap → C (150)
    (1, 0, 1.0), (1, 10, 2.0), (1, 25, 3.0), (1, 85, 4.0), (1, 150, 5.0),
    # u2: one long session, 20-min spacing
    (2, 0, 10.0), (2, 20, 10.0), (2, 40, 10.0),
    # u3: two singleton sessions
    (3, 0, 7.0), (3, 200, 8.0),
]


def test_sessionize_batch_golden(spark):
    got = {
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour): (
            r["n_events"], r["total_value"]
        )
        for r in sessionize_batch(_mk_events(spark, SESSION_ROWS), 30.0).collect()
    }
    assert got == {
        (1, 12 * 60 + 0): (3, 6.0),
        (1, 13 * 60 + 25): (1, 4.0),   # 85 min after 12:00
        (1, 14 * 60 + 30): (1, 5.0),   # 150 min
        (2, 12 * 60 + 0): (3, 30.0),
        (3, 12 * 60 + 0): (1, 7.0),
        (3, 15 * 60 + 20): (1, 8.0),   # 200 min
    }


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    """applyInPandasWithState: sessions proven closed by a later event are
    emitted; each user's open tail session stays in state (documented
    contract — a later batch or timeout would flush it)."""
    events = _mk_events(spark, SESSION_ROWS)
    src = str(tmp_path / "sess")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize(stream, gap_minutes=30.0)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour): (
            r["n_events"], r["total_value"]
        )
        for r in spark.table("sessions").collect()
    }
    # closed = all batch sessions except each user's last
    assert got == {
        (1, 12 * 60 + 0): (3, 6.0),
        (1, 13 * 60 + 25): (1, 4.0),
        (3, 12 * 60 + 0): (1, 7.0),
    }


def test_sessionize_stream_closes_across_batches(spark, tmp_path):
    """A second batch arriving later must close sessions left open by the
    first (cross-batch state carry)."""
    first = [r for r in SESSION_ROWS if r[0] == 2]
    second = [(2, 300, 1.0)]  # 5h later → closes the open session
    d = tmp_path / "sess2"
    d.mkdir()
    import glob
    import os
    import shutil

    for i, rows in enumerate([first, second]):
        stage = str(tmp_path / f"stage{i}")
        _mk_events(spark, rows).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = str(d / f"b{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        sessionize(stream, gap_minutes=30.0)
        .writeStream.format("memory")
        .queryName("sessions2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["user_id"], r["n_events"], r["total_value"])
        for r in spark.table("sessions2").collect()
    ]
    assert got == [(2, 3, 30.0)]
