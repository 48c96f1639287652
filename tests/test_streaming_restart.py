"""Checkpoint-restart semantics of the streaming path.

A production stream dies and restarts; Spark's checkpoint must carry
the file-source progress so already-processed input is never
re-emitted (exactly-once into the sink given idempotent/append sinks
and a deterministic query). This is infrastructure behavior the
per-query oracle checks can't see — a restart that reprocessed old
files would still hash-match any single run.
"""

from __future__ import annotations

import os

import pytest

from bigdatafinalproject_hockey_spark.catalog import load_table
from bigdatafinalproject_hockey_spark.streaming import _events_stream_source

SF_DIR = "/root/testdata/sf0.001"


def _run_to_completion(spark, stage: str, checkpoint: str, out: str) -> None:
    schema, decode = _events_stream_source(spark, SF_DIR)
    stream = decode(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    ).select("event_id", "user_id", "value")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_restart_from_checkpoint_never_reprocesses(spark, tmp_path):
    stage = str(tmp_path / "stage")
    checkpoint = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(stage)
    src = os.path.join(SF_DIR, "events.parquet")
    n = load_table(spark, "events", SF_DIR).count()

    # run 1: one copy of the table
    os.symlink(src, os.path.join(stage, "events_0.parquet"))
    _run_to_completion(spark, stage, checkpoint, out)
    assert spark.read.parquet(out).count() == n

    # crash + restart: two NEW copies arrive; the old file is still
    # listed in the directory but the checkpoint must skip it
    os.symlink(src, os.path.join(stage, "events_1.parquet"))
    os.symlink(src, os.path.join(stage, "events_2.parquet"))
    _run_to_completion(spark, stage, checkpoint, out)

    got = spark.read.parquet(out)
    # 3 copies of every event — NOT 4 (a re-read of events_0 after
    # restart would show up as a fourth)
    assert got.count() == 3 * n
    per_id = got.groupBy("event_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_id] == [3]


def test_left_outer_flush_rerun_idempotent(spark):
    """The flush-batch staging (read_events_stream_with_flush) is
    created on first use and reused after; a second invocation of the
    left-outer join must see the identical staged source and produce
    the identical result — and the outer semantics must actually
    fire (some clicks with zero purchases in the window)."""
    from bigdatafinalproject_hockey_spark.queries import QUERIES

    q = QUERIES["stream_stream_left_outer"]
    a = sorted(map(tuple, q(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert a == b
    assert any(r[2] == 0 for r in a), "no unmatched clicks emitted"
    assert all(r[0] >= 0 for r in a), "flush sentinel leaked into output"


def test_stage_source_links_owns_directory(tmp_path):
    """_stage_source_links must leave the stage dir with EXACTLY the
    expected data links: stale symlinks from an older staging layout
    are removed (a leftover would double-ingest every event), dangling
    links are re-pointed instead of crashing, and regular files (the
    staged flush batch) are preserved."""
    from bigdatafinalproject_hockey_spark.streaming import _stage_source_links

    src = "/root/testdata/sf0.001/events.parquet"
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    os.symlink(src, os.path.join(stage, "events.parquet"))  # old layout
    os.symlink("/nonexistent/x.parquet", os.path.join(stage, "events_00000.parquet"))
    with open(os.path.join(stage, "zz_flush.parquet"), "wb") as f:
        f.write(b"keep me")
    _stage_source_links(stage, {"events": src})
    names = sorted(os.listdir(stage))
    assert names == ["events_00000.parquet", "zz_flush.parquet"]
    assert os.path.realpath(os.path.join(stage, "events_00000.parquet")) == src
    with open(os.path.join(stage, "zz_flush.parquet"), "rb") as f:
        assert f.read() == b"keep me"


def test_upsert_crash_between_writes_then_replay(spark, tmp_path):
    """Batch-id-keyed overwrite safety (VERDICT r4 item 4a): a batch
    that crashed AFTER its sink write but BEFORE its index write is
    replayed by the checkpoint; the replay must overwrite its own
    directories and the final sink must hold each key exactly once."""
    from bigdatafinalproject_hockey_spark.streaming import _novel_rows

    sink = str(tmp_path / "sink")
    index = str(tmp_path / "idx")
    events = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "value"
    )
    b0 = events.limit(100)
    b1 = events.limit(150)  # overlaps b0's keys: 50 novel

    def write_batch(df, bid, crash_before_index=False):
        b = _novel_rows(spark, df, index, ["event_id"], bid)
        b.persist()
        b.write.mode("overwrite").parquet(f"{sink}/ingest_batch={bid}")
        if not crash_before_index:
            b.select("event_id").write.mode("overwrite").parquet(
                f"{index}/ingest_batch={bid}"
            )
        b.unpersist()

    write_batch(b0, 0)
    write_batch(b1, 1, crash_before_index=True)  # crash window
    write_batch(b1, 1)  # checkpoint replay of the same batch id
    got = spark.read.parquet(sink)
    assert got.count() == 150
    assert got.select("event_id").distinct().count() == 150


def test_upsert_reconcile_heals_lost_checkpoint(spark, tmp_path):
    """reconcile_key_index (VERDICT r4 item 4a, the no-replay window):
    sink batch dir exists, index twin missing, checkpoint gone so the
    batch never replays. Without reconciliation a later batch carrying
    the same keys re-appends them; with it they are filtered."""
    from bigdatafinalproject_hockey_spark.streaming import (
        _novel_rows,
        reconcile_key_index,
    )

    sink = str(tmp_path / "sink")
    index = str(tmp_path / "idx")
    events = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "value"
    )
    b0 = events.limit(100)

    # batch 0 crashed between writes; checkpoint was then lost
    _novel_rows(spark, b0, index, ["event_id"], 0).write.mode(
        "overwrite"
    ).parquet(f"{sink}/ingest_batch=0")
    assert not os.path.isdir(f"{index}/ingest_batch=0")

    healed = reconcile_key_index(spark, sink, index, ["event_id"])
    assert healed == [0]
    # idempotent: second call finds nothing to heal
    assert reconcile_key_index(spark, sink, index, ["event_id"]) == []

    # a NEW batch (fresh checkpoint numbering) re-delivers b0's keys
    b = _novel_rows(spark, b0, index, ["event_id"], None)
    assert b.count() == 0, "healed index failed to filter re-delivered keys"
