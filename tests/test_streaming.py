"""Structured Streaming: each streaming form must agree with its
batch analog on the same drained input (the incremental-view check),
and the idempotent append must survive replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.sources.readers import read_events
from mpg_data_warehouse_spark.streaming import events as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """The driver's events table re-written with a normalized µs
    TIMESTAMP ``ts`` (the raw parquet layout varies by driver
    generation and nanos is unsupported by stream readers)."""
    out = str(tmp_path_factory.mktemp("events_stream") / "src")
    (
        read_events(spark, f"{SF}/events.parquet")
        .repartition(4)  # several files → several stream splits
        .write.parquet(out)
    )
    return out


def test_hourly_rollup_stream_matches_batch(spark, events_dir):
    stream = S.hourly_rollup_stream(S.read_events_stream(spark, events_dir))
    S.run_to_memory(stream, "rollup_t", timeout_s=180)
    got = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("rollup_t").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    want = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want


def test_hourly_rollup_over_projected_stage_matches_full(
    spark, events_dir, tmp_path
):
    """r13: a stage written with ONLY the columns the rollup consumes
    (ts/event_type/value/user_id — the driver query's staging
    projection) must drain to the identical rollup as the full-column
    stage, and the column-subset stream schema must reject unknown
    names rather than silently yielding nulls."""
    cols = ["ts", "event_type", "value", "user_id"]
    proj_dir = str(tmp_path / "proj_src")
    spark.read.parquet(events_dir).select(*cols).write.parquet(proj_dir)
    stream = S.hourly_rollup_stream(
        S.read_events_stream(spark, proj_dir, columns=cols)
    )
    S.run_to_memory(stream, "rollup_proj_t", timeout_s=180)
    got = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value, r.approx_users)
        for r in spark.table("rollup_proj_t").collect()
    }
    full = S.hourly_rollup_stream(S.read_events_stream(spark, events_dir))
    S.run_to_memory(full, "rollup_full_t", timeout_s=180)
    want = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value, r.approx_users)
        for r in spark.table("rollup_full_t").collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="unknown event columns"):
        S.read_events_stream(spark, proj_dir, columns=["ts", "nope"])


def test_dedup_stream_collapses_replays(spark, events_dir, tmp_path):
    dup_dir = str(tmp_path / "dup_src")
    src = spark.read.parquet(events_dir)
    src.unionByName(src.limit(50)).repartition(3).write.parquet(dup_dir)
    n_unique = src.count()

    out = S.dedup_stream(S.read_events_stream(spark, dup_dir))
    S.run_to_memory(out, "dedup_t", timeout_s=180)
    got = spark.table("dedup_t")
    assert got.count() == n_unique
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0


def test_sessionize_stream_matches_batch_session_count(spark, events_dir):
    stream = S.sessionize_stream(S.read_events_stream(spark, events_dir))
    S.run_to_memory(stream, "sess_t", timeout_s=180)
    got = (
        spark.table("sess_t")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_ev"))
    )
    # Batch analog: 30-min-gap lag+running-sum sessionization.
    ev = spark.read.parquet(events_dir)
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy(us)
    marked = ev.select(
        "user_id",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1800000000), 1
        )
        .otherwise(0)
        .alias("is_start"),
    )
    want = marked.groupBy("user_id").agg(
        F.sum("is_start").alias("n_sessions"), F.count(F.lit(1)).alias("n_ev")
    )
    got_m = {r.user_id: (r.n_sessions, r.n_ev) for r in got.collect()}
    want_m = {r.user_id: (r.n_sessions, r.n_ev) for r in want.collect()}
    assert got_m == want_m


def test_idempotent_append_stream_replay_adds_nothing(
    spark, events_dir, tmp_path
):
    sink = str(tmp_path / "sink")
    q = S.idempotent_append_stream(
        S.read_events_stream(spark, events_dir),
        sink,
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(180)
    n1 = spark.read.parquet(sink).count()
    assert n1 == spark.read.parquet(events_dir).count()

    # Replay the same input with a FRESH checkpoint (simulating a
    # redelivered/reprocessed source): anti-join must add zero rows.
    q2 = S.idempotent_append_stream(
        S.read_events_stream(spark, events_dir),
        sink,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    assert spark.read.parquet(sink).count() == n1


def test_idempotent_append_corrupt_sink_fails_not_duplicates(
    spark, events_dir, tmp_path
):
    """A sink that EXISTS but cannot be read must fail the micro-batch
    (so the trigger retries), never silently skip the anti-join and
    double-insert — the guarantee the explicit existence probe exists
    to protect."""
    import pyspark.errors

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    with open(os.path.join(sink, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    q = S.idempotent_append_stream(
        S.read_events_stream(spark, events_dir),
        sink,
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(pyspark.errors.StreamingQueryException):
        q.awaitTermination(180)


def test_stateful_running_totals_matches_batch(spark, events_dir):
    """applyInPandasWithState accumulator: after draining the whole
    input, per-user totals must equal the batch groupBy."""
    stream = S.running_user_totals_stream(S.read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("totals_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode may emit intermediate rows across batches; the LAST
    # row per user is the final state (single-batch availableNow run
    # emits exactly one row per user).
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("totals_t").collect()
    }
    want = {
        r.user_id: (r.n, r.t)
        for r in (
            spark.read.parquet(events_dir)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("t"),
            )
            .collect()
        )
    }
    assert got == want


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg with a 2h watermark: an event arriving
    a micro-batch later but 12h in the past targets a finalized window
    and must be DROPPED (bounded state ⇒ late data loss is explicit)."""
    import os
    import time as _time

    import pandas as pd

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_file(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        path = os.path.join(src, name)
        pdf.to_parquet(path)
        os.utime(path, (mtime, mtime))

    base = "2024-03-01 {h:02d}:30:00"
    now = _time.time()
    # batch 1: one event per hour, hours 0..10
    write_file(
        "a.parquet",
        [(i, base.format(h=i), 1, "click", 1.0, "{}") for i in range(11)],
        now - 100,
    )
    # batch 2: fresh event at hour 12 — advances the watermark so the
    # hour-0 window's state is EVICTED (drop is only guaranteed for
    # evicted state; a late row arriving while state is live may merge)
    write_file(
        "b.parquet",
        [(101, base.format(h=12), 1, "click", 1.0, "{}")],
        now - 70,
    )
    # batch 3: the LATE replay of hour 0 + a fresh event at hour 13
    write_file(
        "c.parquet",
        [(100, base.format(h=0), 1, "click", 1.0, "{}"),
         (102, base.format(h=13), 1, "click", 1.0, "{}")],
        now - 40,
    )

    events = spark.readStream.schema(S.EVENTS_STREAM_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.hour("w.start").alias("h"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.h: r.n_events for r in spark.table("late_t").collect()}
    assert got.get(0) == 1      # late replay did NOT inflate hour 0
    assert 13 not in got        # unfinalized window not emitted
    assert all(v == 1 for v in got.values())


def test_click_attribution_stream_matches_batch(spark, events_dir):
    """Stream-stream join must agree with the batch range join on the
    same drained input."""
    ev = spark.read.parquet(events_dir)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    imp_type, click_type = sorted(types)[0], sorted(types)[-1]

    imp_stream = S.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == imp_type
    )
    clk_stream = S.read_events_stream(spark, events_dir).filter(
        F.col("event_type") == click_type
    )
    joined = S.click_attribution_stream(imp_stream, clk_stream, "1 hour")
    S.run_to_memory(joined, "attrib_t", timeout_s=180)
    got = {
        (r.user_id, r.imp_ts, r.click_ts)
        for r in spark.table("attrib_t").collect()
    }

    imp_b = ev.filter(F.col("event_type") == imp_type).select(
        "user_id", F.col("ts").alias("imp_ts")
    )
    clk_b = ev.filter(F.col("event_type") == click_type).select(
        F.col("user_id").alias("cuid"), F.col("ts").alias("click_ts")
    )
    batch = imp_b.join(
        clk_b,
        (F.col("user_id") == F.col("cuid"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts") <= F.col("imp_ts") + F.expr("INTERVAL 1 hour")),
    )
    want = {
        (r.user_id, r.imp_ts, r.click_ts) for r in batch.collect()
    }
    assert got == want and got  # non-empty agreement


def test_idempotent_append_checkpoint_resume_reads_only_new_files(
    spark, tmp_path
):
    """Restart with the SAME checkpoint after new source files arrive:
    the file-source offset log must hand the resumed run only the new
    files, and the sink ends exactly complete with no duplicates."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    first = read_events(spark, f"{SF}/events.parquet").filter(
        F.col("event_id") < 500
    )
    second = read_events(spark, f"{SF}/events.parquet").filter(
        F.col("event_id") >= 500
    )
    first.write.parquet(src)

    q = S.idempotent_append_stream(S.read_events_stream(spark, src), sink, ckpt)
    q.awaitTermination(180)
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()

    second.write.mode("append").parquet(src)
    q2 = S.idempotent_append_stream(S.read_events_stream(spark, src), sink, ckpt)
    q2.awaitTermination(180)
    got = spark.read.parquet(sink)
    assert got.count() == first.count() + second.count()
    assert got.select("event_id").distinct().count() == got.count()


def test_streaming_hll_registers_match_batch_sketch(spark, events_dir):
    """running_distinct_users_stream: after draining the input, the
    streamed per-type HLL registers must be BIT-IDENTICAL to the
    batch hll_sketch over the same rows (the lambda-architecture
    reconciliation claim), and the emitted estimate must match the
    column-form hll_estimate."""
    from mpg_data_warehouse_spark.operators.sketch import (
        hll_estimate,
        hll_sketch,
    )

    stream = S.running_distinct_users_stream(
        S.read_events_stream(spark, events_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: (list(r.hll_registers), r.hll_users)
        for r in spark.table("hll_t").collect()
    }
    batch = hll_sketch(
        spark.read.parquet(events_dir), ["event_type"], "user_id"
    )
    want = {
        r.event_type: (
            list(r.hll_registers),
            r.est,
        )
        for r in batch.select(
            "event_type",
            "hll_registers",
            hll_estimate(F.col("hll_registers")).alias("est"),
        ).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0], f"registers diverge for {t}"
        assert got[t][1] == pytest.approx(want[t][1], abs=1e-4)


def test_streaming_hll_skips_null_users_like_batch(spark, tmp_path):
    """Null-bearing batches must not desync the stream from batch: the
    NULL is skipped (isNotNull parity), ids above 2^53 sharing the
    batch survive exactly (the string projection — an int64→float64
    round-trip rounded them), and a group whose users are ALL null
    emits nothing, exactly as batch hll_sketch drops it."""
    from mpg_data_warehouse_spark.operators.sketch import hll_sketch

    src = str(tmp_path / "null_events")
    rows = [(i, i % 7 if i % 5 else None, "click", 1.0) for i in range(60)]
    # a null + a 2^53+1 id in the SAME group: float64 coercion would
    # round the big id to 2^53 and hash the wrong register
    rows += [(100, None, "click", 1.0), (101, (1 << 53) + 1, "click", 1.0)]
    # a group with ONLY null users: batch emits no row; stream must not
    rows += [(102, None, "beacon", 1.0)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") + 1_700_000_000)) \
     .withColumn("props", F.lit("{}")) \
     .write.parquet(src)
    stream = S.running_distinct_users_stream(
        S.read_events_stream(spark, src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_null_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: list(r.hll_registers)
        for r in spark.table("hll_null_t").collect()
    }
    want = {
        r.event_type: list(r.hll_registers)
        for r in hll_sketch(
            spark.read.parquet(src), ["event_type"], "user_id"
        ).collect()
    }
    assert got == want


def test_streaming_kmv_minima_match_batch_sketch(spark, events_dir):
    """running_distinct_kmv_stream: after draining the input, the
    streamed per-type bottom-k arrays must be BIT-IDENTICAL to the
    batch kmv_sketch over the same rows, the estimate must match the
    column form, and the streamed state must stay intersectable with
    a batch sketch (the live audience-overlap claim)."""
    from mpg_data_warehouse_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
        py_kmv_intersect_estimate,
    )

    stream = S.running_distinct_kmv_stream(
        S.read_events_stream(spark, events_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kmv_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: (list(r.kmv_minima), r.kmv_users)
        for r in spark.table("kmv_t").collect()
    }
    batch = kmv_sketch(
        spark.read.parquet(events_dir), ["event_type"], "user_id"
    )
    want = {
        r.event_type: (list(r.kmv_minima), r.est)
        for r in batch.select(
            "event_type",
            "kmv_minima",
            kmv_estimate(F.col("kmv_minima")).alias("est"),
        ).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0], f"minima diverge for {t}"
        assert got[t][1] == pytest.approx(want[t][1], abs=1e-4)
    # streamed state intersects with a batch sketch of another segment
    types = sorted(want)
    if len(types) >= 2:
        est = py_kmv_intersect_estimate(got[types[0]][0], want[types[1]][0])
        assert est >= 0.0


def test_streaming_kmv_skips_null_users_like_batch(spark, tmp_path):
    """Null-bearing batches must not desync stream from batch: NULLs
    skipped, >2^53 ids sharing a batch survive exactly, and an
    all-null group emits nothing (batch absence parity)."""
    from mpg_data_warehouse_spark.operators.sketch import kmv_sketch

    src = str(tmp_path / "null_events_kmv")
    rows = [(i, i % 7 if i % 5 else None, "click", 1.0) for i in range(60)]
    rows += [(100, None, "click", 1.0), (101, (1 << 53) + 1, "click", 1.0)]
    rows += [(102, None, "beacon", 1.0)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") + 1_700_000_000)) \
     .withColumn("props", F.lit("{}")) \
     .write.parquet(src)
    stream = S.running_distinct_kmv_stream(
        S.read_events_stream(spark, src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kmv_null_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: list(r.kmv_minima)
        for r in spark.table("kmv_null_t").collect()
    }
    want = {
        r.event_type: list(r.kmv_minima)
        for r in kmv_sketch(
            spark.read.parquet(src), ["event_type"], "user_id"
        ).collect()
    }
    assert got == want


def test_streaming_cms_counters_match_batch_sketch(spark, events_dir):
    """running_term_freq_stream: drained counters must be
    BIT-IDENTICAL to the batch cms_sketch over the same rows —
    counters are sums, so agreement holds regardless of micro-batch
    boundaries or order."""
    from mpg_data_warehouse_spark.operators.sketch import cms_sketch

    stream = S.running_term_freq_stream(
        S.read_events_stream(spark, events_dir), width=256, depth=4
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cms_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: list(r.cms_counters)
        for r in spark.table("cms_t").collect()
    }
    want = {
        r.event_type: list(r.cms_counters)
        for r in cms_sketch(
            spark.read.parquet(events_dir),
            ["event_type"],
            "user_id",
            width=256,
            depth=4,
        ).collect()
    }
    assert got == want


def test_streaming_quantile_sample_matches_batch_sketch(spark, events_dir):
    """running_quantile_stream: the drained per-type bottom-k (hash,
    value) sample must be BIT-IDENTICAL to the batch quantile_sketch
    over the same rows, and the emitted running median must equal the
    column-form estimate."""
    from mpg_data_warehouse_spark.operators.sketch import (
        quantile_estimate,
        quantile_sketch,
    )

    stream = S.running_quantile_stream(
        S.read_events_stream(spark, events_dir), k=64
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("qs_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: ([(s["h"], s["v"]) for s in r.qs_sample], r.qs_p50)
        for r in spark.table("qs_t").collect()
    }
    batch = quantile_sketch(
        spark.read.parquet(events_dir),
        ["event_type"],
        "value",
        ["event_id"],
        k=64,
    )
    want = {
        r.event_type: ([(s["h"], s["v"]) for s in r.qs_sample], r.m)
        for r in batch.select(
            "event_type",
            "qs_sample",
            quantile_estimate(F.col("qs_sample"), 0.5).alias("m"),
        ).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0], f"sample diverges for {t}"
        assert got[t][1] == want[t][1], f"median diverges for {t}"


def test_run_to_memory_handles_stateful_streams(spark, events_dir):
    """run_to_memory's output-mode pick must cover all three stream
    shapes: applyInPandasWithState plans require UPDATE (the old
    Aggregate-only sniff chose append and start() raised
    AnalysisException), windowed aggs take COMPLETE, stateless maps
    take APPEND."""
    stream = S.running_user_totals_stream(
        S.read_events_stream(spark, events_dir)
    )
    q = S.run_to_memory(stream, "rtm_stateful_t", timeout_s=180)
    assert not q.isActive
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("rtm_stateful_t").collect()
    }
    want = {
        r.user_id: (r.n, r.t)
        for r in (
            spark.read.parquet(events_dir)
            .where(F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("t"),
            )
        ).collect()
    }
    assert {u: (n, round(t, 6)) for u, (n, t) in got.items()} == want
