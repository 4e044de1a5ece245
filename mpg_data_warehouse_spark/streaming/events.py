"""Structured Streaming over the events surface (SURVEY §2.9: the
reference is batch-only; this is the §7 extension that runs the same
query shapes incrementally).

Mappings (batch analog → streaming form):

* ``events_hourly_rollup`` → watermarked tumbling-window aggregate
  (``approx_count_distinct`` replaces exact distinct — exact distinct
  over unbounded streams needs unbounded state).
* ``sessionize_events`` (lag + running-sum) → ``session_window`` with
  the same 30-minute gap: Spark's native stateful session operator.
* The reference's idempotent anti-join append (J6/S9,
  notebooks/update_gridVeg_additional_species.ipynb:889-938) →
  ``foreachBatch`` + anti-join against the sink — exactly-once-ish
  append on at-least-once delivery.

State-at-scale notes: watermark bounds all window/dedup state; the
rollup's state key space is (hour × event_type) — tiny; dedup state is
one entry per event_id within the watermark horizon, the standard
at-scale dedup configuration (RocksDB state store in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (explicit schema —
    streaming sources cannot infer).

    ``columns`` (r13, guide §2.3): restrict the stream schema to a
    subset of the event columns, for staged directories that were
    deliberately written projected — a staging writer that drops the
    columns its consumer never reads writes proportionally fewer
    bytes, and the projection contract lives HERE so the reader can
    never silently expect a column the stage did not carry. Order
    follows the canonical schema; unknown names raise."""
    if columns is None:
        schema = EVENTS_STREAM_SCHEMA
    else:
        want = set(columns)
        known = {f.name for f in EVENTS_STREAM_SCHEMA.fields}
        unknown = want - known
        if unknown:
            raise ValueError(
                f"unknown event columns {sorted(unknown)}; "
                f"schema has {sorted(known)}"
            )
        schema = StructType(
            [f for f in EVENTS_STREAM_SCHEMA.fields if f.name in want]
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window rollup — the incremental form of
    the batch events_hourly_rollup driver query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-id within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keys state on event_id and
    expires it past the watermark — bounded state at any throughput."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native stateful session windows (30-min inactivity gap —
    identical session semantics to the batch lag+running-sum
    sessionize_events query)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def running_user_totals_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (n_events, total_value) accumulator that emits
    the updated row on every micro-batch — the shape for stateful
    logic the built-in aggregates can't express (per-key model state,
    custom eviction, decaying counters, ...).

    State is one small tuple per user_id, Arrow-marshalled per batch;
    GroupStateTimeout would bound it in a production deployment."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": [round(total, 2)],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_distinct_users_stream(
    events: DataFrame, watermark: str = "2 hours", p: int = 8
) -> DataFrame:
    """Streaming approximate-distinct via HLL register state: per
    event_type, the ``2^p`` register array (``operators/sketch.py``
    algebra, bit-identical — the stream and the batch ``hll_sketch``
    produce the SAME registers, pinned by the batch-agreement test)
    is the ``applyInPandasWithState`` state, updated per micro-batch
    and emitted with the estimate.

    This is the aggregate exact ``approx_count_distinct`` streaming
    can't give you incrementally: register max is monotone under
    inserts, so append-only streams maintain the sketch EXACTLY
    (deletes/retractions would need a rebuild — same caveat as every
    HLL). State is m ints per key, fixed-size forever — no growth
    with stream length, unlike a distinct-set state. The emitted
    registers stay joinable/mergeable with batch sketches
    (``hll_merge``) for lambda-architecture reconciliation."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mpg_data_warehouse_spark.operators.sketch import (
        py_estimate,
        py_update_registers,
    )

    m = 1 << p
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("hll_users", DoubleType()),
            StructField("hll_registers", ArrayType(IntegerType())),
        ]
    )
    state_schema = StructType(
        [StructField("regs", ArrayType(IntegerType()))]
    )

    def update(key, pdfs, state: GroupState):
        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            # _uid is projected as STRING below, so the column crosses
            # Arrow→pandas as exact object strings even when a batch
            # carries nulls — no float64 coercion, no 2^53 id rounding
            # (the int64 path corrupted >2^53 ids whenever a null
            # shared the batch); NULLs arrive as None and are skipped
            # (batch isNotNull parity).
            py_update_registers(regs, pdf["_uid"].tolist(), p)
        if not any(regs):
            # every value so far was NULL: emit nothing and keep no
            # state, mirroring the batch hll_sketch's all-null-group
            # absence (registers are monotone, so a later real value
            # starts the group cleanly)
            return
        state.update((regs,))
        import pandas as pd

        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "hll_users": [py_estimate(regs, p)],
                "hll_registers": [regs],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            "event_type",
            # string projection BEFORE the Arrow boundary: the batch
            # side hashes md5(CAST(user_id AS STRING)), and an object
            # (string) pandas column is the only dtype that survives
            # null-bearing batches without corrupting exact longs
            F.col("user_id").cast("string").alias("_uid"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_distinct_kmv_stream(
    events: DataFrame, watermark: str = "2 hours", k: int = 64
) -> DataFrame:
    """Streaming bottom-k distinct via KMV state: per event_type, the
    sorted k-smallest-hash array (``operators/sketch.py`` algebra,
    bit-identical — stream and batch ``kmv_sketch`` produce the SAME
    array, pinned by the batch-agreement test) is the
    ``applyInPandasWithState`` state, updated per micro-batch and
    emitted with the estimate.

    The HLL twin (``running_distinct_users_stream``) answers "how
    many"; this one keeps SET ALGEBRA open on the emitted state:
    per-segment streamed sketches intersect (`kmv_intersect_estimate`)
    and union with each other AND with batch-built sketches — live
    audience-overlap dashboards from fixed-size state. Insert-only
    streams maintain the bottom-k EXACTLY (an evicted hash exceeded
    the k-th smallest, which only decreases, so it can never
    re-enter); state is ≤ k longs per key, forever."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mpg_data_warehouse_spark.operators.sketch import (
        py_kmv_estimate,
        py_kmv_update,
    )

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("kmv_users", DoubleType()),
            StructField("kmv_minima", ArrayType(LongType())),
        ]
    )
    state_schema = StructType(
        [StructField("minima", ArrayType(LongType()))]
    )

    def update(key, pdfs, state: GroupState):
        sk = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            # string projection (see the HLL twin): object dtype is
            # the only one that survives null-bearing batches without
            # int64->float64 coercion corrupting ids above 2^53
            sk = py_kmv_update(sk, pdf["_uid"].tolist(), k)
        if not sk:
            # all values so far were NULL: no row, no state — the
            # batch kmv_sketch drops the all-null group the same way
            return
        state.update((sk,))
        import pandas as pd

        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "kmv_users": [py_kmv_estimate(sk, k)],
                "kmv_minima": [sk],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            "event_type",
            F.col("user_id").cast("string").alias("_uid"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_quantile_stream(
    events: DataFrame, watermark: str = "2 hours", k: int = 256
) -> DataFrame:
    """Streaming quantiles via bottom-k ROW-sample state: per
    event_type, the k (id-hash, value) pairs with the smallest hashes
    (``operators/sketch.py`` quantile-sketch algebra, bit-identical —
    stream and batch ``quantile_sketch`` keep the SAME sample, pinned
    by the batch-agreement test) are the ``applyInPandasWithState``
    state, updated per micro-batch and emitted with the running
    median estimate.

    Completes the streaming sketch QUADRUPLE (HLL "how many
    distinct", KMV "which segments overlap", CMS "how often",
    bottom-k sample "what does the distribution look like") — the
    emitted state merges with batch-built sketches
    (``quantile_merge``), so a live latency/price-quantile dashboard
    reconciles hot streamed samples against cold batch rebuilds
    without raw-row replays. Insert-only streams maintain the
    bottom-k EXACTLY (the KMV twin's eviction argument, applied to
    (hash, value) pairs); state is ≤ k (long, double) pairs per key,
    forever."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mpg_data_warehouse_spark.operators.sketch import (
        py_qs_estimate,
        py_qs_update,
    )

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("qs_p50", DoubleType()),
            StructField(
                "qs_sample",
                ArrayType(
                    StructType(
                        [
                            StructField("h", LongType()),
                            StructField("v", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    state_schema = StructType(
        [
            StructField("hs", ArrayType(LongType())),
            StructField("vs", ArrayType(DoubleType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        sample = (
            list(zip(state.get[0], state.get[1])) if state.exists else []
        )
        for pdf in pdfs:
            # string projections (see the HLL twin's dtype note): the
            # id crosses as exact object strings; the value column is
            # float64-native so it crosses as-is
            pairs = zip(pdf["_eid"].tolist(), pdf["_val"].tolist())
            sample = py_qs_update(sample, pairs, k)
        if not sample:
            # every value so far was NULL: no row, no state — batch
            # quantile_sketch drops the all-null group the same way
            return
        state.update(([h for h, _ in sample], [v for _, v in sample]))
        import pandas as pd

        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "qs_p50": [py_qs_estimate(sample, 0.5)],
                # dict rows: the Arrow boundary maps them onto the
                # struct<h, v> element type (tuples don't)
                "qs_sample": [[{"h": h, "v": v} for h, v in sample]],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            "event_type",
            F.col("event_id").cast("string").alias("_eid"),
            F.col("value").cast("double").alias("_val"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_term_freq_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Streaming mergeable FREQUENCY state: per event_type, the flat
    Count-Min counter array (``operators/sketch.py`` algebra,
    bit-identical — counters are SUMS, so the drained stream state
    equals the batch ``cms_sketch`` exactly regardless of batch
    order, the strongest of the three sketch families' agreement
    guarantees) is the ``applyInPandasWithState`` state.

    Completes the streaming sketch triple (HLL "how many distinct",
    KMV "which segments overlap", CMS "how often") — all three emit
    state that merges with batch-built sketches, so a lambda
    architecture reconciles hot streamed counters against cold batch
    rebuilds with element-wise sums, never a raw-row replay. State is
    width·depth longs per key, fixed forever."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mpg_data_warehouse_spark.operators.sketch import py_cms_update

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("cms_counters", ArrayType(LongType())),
        ]
    )
    state_schema = StructType(
        [StructField("counters", ArrayType(LongType()))]
    )

    def update(key, pdfs, state: GroupState):
        counters = (
            list(state.get[0]) if state.exists else [0] * (width * depth)
        )
        for pdf in pdfs:
            # string projection: see the HLL twin's dtype note
            py_cms_update(counters, pdf["_uid"].tolist(), width, depth)
        if not any(counters):
            # all values so far were NULL — no row, no state (batch
            # cms_sketch drops the all-null group the same way)
            return
        state.update((counters,))
        import pandas as pd

        yield pd.DataFrame(
            {"event_type": [key[0]], "cms_counters": [counters]}
        )

    return (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            "event_type",
            F.col("user_id").cast("string").alias("_uid"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _sink_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — works for
    any scheme Spark can read (local, HDFS, object stores), unlike an
    ``os.path`` check."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def idempotent_append_stream(
    events: DataFrame,
    sink_path: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
):
    """The reference's signature ingest op, streaming form: each
    micro-batch anti-joins the sink on the key before appending, so
    replays/overlapping inputs never double-insert (J6/S9 parity).

    The sink-absent case is detected by an EXPLICIT existence probe,
    not by catching read errors: a transient read failure or a
    corrupted sink must propagate and fail the micro-batch (so the
    trigger retries it) rather than silently skipping the anti-join
    and double-inserting — the no-double-insert guarantee depends on
    every successful batch having seen the real sink state.

    Returns the started StreamingQuery (availableNow trigger: drain
    what exists, then stop — the batch-job-shaped streaming run)."""
    keys = keys or ["event_id"]

    def append_batch(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        if _sink_exists(spark, sink_path):
            existing = spark.read.parquet(sink_path).select(*keys)
            fresh = batch_df.join(existing, keys, "left_anti")
        else:  # first batch: sink does not exist yet
            fresh = batch_df
        # In-batch dup collapse, then append.
        fresh.dropDuplicates(keys).write.mode("append").parquet(sink_path)

    return (
        events.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_s: int = 120):
    """Drain a stream into an in-memory table (tests / smoke checks):
    availableNow + an output mode matched to the plan's statefulness,
    blocks until the drain finishes."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(_drain_mode(stream_df))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def _drain_mode(df: DataFrame) -> str:
    """Output mode for a full drain: windowed/global aggregations need
    ``complete`` (every finalized group re-emitted), the
    ``applyInPandasWithState`` operators run in ``update`` (their
    GroupStateTimeout contract — Spark REJECTS append for them, and
    complete is unsupported), everything stateless drains as plain
    ``append``. The old Aggregate-only sniff sent every
    applyInPandasWithState stream to append and the start() raised."""
    plan = df._jdf.queryExecution().analyzed().toString()
    if "FlatMapGroupsInPandasWithState" in plan:
        return "update"
    if "Aggregate" in plan:
        return "complete"
    return "append"


def click_attribution_stream(
    impressions: DataFrame,
    clicks: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each click to
    the impression of the same user that happened at most ``max_delay``
    earlier — the streaming form of the batch
    ``range_join_click_attribution`` query (operators/temporal.py).

    Both sides carry a watermark plus the time-range join condition;
    together they bound the join state Spark must buffer: an
    impression can be evicted once the watermark passes its timestamp
    + max_delay, a click once the watermark passes its timestamp.
    Without BOTH conditions the state grows forever — that is the
    stream-stream-join contract at 100 TB/day, not an optimization.
    The join itself shuffles both streams by ``user_id`` exactly like
    the batch equi-join; per-micro-batch volume is what sizes the
    cluster, not total history.
    """
    imp = (
        impressions.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("ts").alias("imp_ts"),
            F.col("event_type").alias("imp_type"),
        )
    )
    clk = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
    )
    return imp.join(
        clk,
        [
            imp.user_id == clk.user_id,
            clk.click_ts >= imp.imp_ts,
            clk.click_ts <= imp.imp_ts + F.expr(f"INTERVAL {max_delay}"),
        ],
    ).select(
        imp.user_id,
        "imp_ts",
        "imp_type",
        "click_ts",
        "click_value",
    )
