"""Exactly-once streaming sink on the txlog table format: replayed
batches are skipped, merge mode upserts by key, and a real
Structured Streaming query lands each micro-batch as one atomic
commit."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.sources import txlog
from mpg_data_warehouse_spark.streaming.txlog_sink import (
    foreach_batch_writer,
    last_committed_batch,
)


def _empty(spark):
    return spark.createDataFrame(
        [], "doc_id bigint, text string"
    )


def test_append_mode_skips_replayed_batch(spark, tmp_path):
    t = str(tmp_path / "t")
    txlog.create(spark, t, _empty(spark))
    write = foreach_batch_writer(t, app_id="app1")
    b0 = spark.createDataFrame([Row(doc_id=1, text="a")])
    write(b0, 0)
    assert txlog.read(spark, t).count() == 1
    # at-least-once replay of the SAME batch id: must be a no-op
    write(b0, 0)
    assert txlog.read(spark, t).count() == 1
    write(spark.createDataFrame([Row(doc_id=2, text="b")]), 1)
    assert txlog.read(spark, t).count() == 2
    assert last_committed_batch(t, "app1") == 1


def test_two_apps_do_not_shadow_each_other(spark, tmp_path):
    t = str(tmp_path / "t")
    txlog.create(spark, t, _empty(spark))
    foreach_batch_writer(t, "appA")(
        spark.createDataFrame([Row(doc_id=1, text="a")]), 5
    )
    # appB's batch 0 must not be skipped because appA is at 5
    foreach_batch_writer(t, "appB")(
        spark.createDataFrame([Row(doc_id=2, text="b")]), 0
    )
    assert txlog.read(spark, t).count() == 2
    assert last_committed_batch(t, "appA") == 5
    assert last_committed_batch(t, "appB") == 0


def test_merge_mode_upserts_by_key(spark, tmp_path):
    t = str(tmp_path / "t")
    txlog.create(
        spark, t, spark.createDataFrame([Row(doc_id=1, text="old")])
    )
    write = foreach_batch_writer(t, "cdc", keys=["doc_id"])
    write(
        spark.createDataFrame(
            [Row(doc_id=1, text="new"), Row(doc_id=2, text="ins")]
        ),
        0,
    )
    got = {r.doc_id: r.text for r in txlog.read(spark, t).collect()}
    assert got == {1: "new", 2: "ins"}
    # replay: still exactly-once
    write(
        spark.createDataFrame(
            [Row(doc_id=1, text="new"), Row(doc_id=2, text="ins")]
        ),
        0,
    )
    assert txlog.read(spark, t).count() == 2


def test_real_stream_commits_per_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    t = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(doc_id=i, text=f"d{i}") for i in range(6)]
    ).coalesce(2).write.parquet(src)
    txlog.create(spark, t, _empty(spark))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_writer(t, "s1"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = txlog.read(spark, t)
    assert got.count() == 6
    assert {r.doc_id for r in got.collect()} == set(range(6))
    hist = txlog.history(t)
    assert sum(1 for h in hist if h["op"] == "stream-append") >= 2


def test_zombie_replay_racing_the_commit_cannot_double_write(spark, tmp_path):
    """The replay guard lives INSIDE the commit closure: even when a
    zombie driver passes the fast pre-check (simulated by committing
    the same batch AFTER the zombie's data files are written), its
    commit attempt re-checks the fresh log and skips."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.streaming import txlog_sink

    t = str(tmp_path / "t")
    txlog.create(spark, t, _empty(spark))
    state = txlog.snapshot_state(t)
    # zombie driver: writes batch 0's files, pre-check passed (log empty)
    zombie_adds = txlog._write_data_files(
        spark.createDataFrame([Row(doc_id=1, text="a")]), t, []
    )
    # the healthy driver lands batch 0 first
    foreach_batch_writer(t, "app")(
        spark.createDataFrame([Row(doc_id=1, text="a")]), 0
    )
    # zombie now tries to commit its copy of batch 0
    import pytest

    with pytest.raises(txlog_sink._AlreadyCommitted):
        txlog_sink._commit_batch(t, "app", 0, "stream-append", zombie_adds)
    assert txlog.read(spark, t).count() == 1  # no double write
