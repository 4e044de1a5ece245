"""Continual corpus curation as a stream: the batch
``plans.pipelines.curate_corpus_pipeline`` stages re-expressed for
micro-batch ingest, so a growing corpus is curated as it arrives
instead of re-curated from scratch per day.

Per micro-batch (``foreachBatch``):

    quality filter → [optional trained-classifier gate] → [optional
    unigram-LM gate] → in-batch exact
    dedup → replay/exact dedup vs the SINK (content-hash anti-join)
    → incremental MinHash near-dup vs the persisted SIGNATURE TABLE
    (``dedup.incremental_minhash_pairs`` — corpus text never re-read)
    → append survivors to sink + their signatures to the table

Contract: ``id_col`` must be monotonically increasing with arrival
order (ingest sequence numbers). That is what makes the keep-first
policy deterministic — in any candidate pair the lower id is the
earlier doc, so the new side is always the drop side.

Exactly-once: both sink and signature table are laid out as
``batch=<id>`` partitions and each micro-batch OVERWRITES its own
partition (the standard idempotent ``foreachBatch`` sink pattern —
Structured Streaming replays a failed batch under the same batch id,
so the retry converges byte-for-byte instead of appending twice).
Cross-batch guards anti-join against the signature table EXCLUDING
the current batch's partition, so a half-written previous attempt can
never shadow its own retry. Even the disaster replay (checkpoint
lost, all source files re-delivered as batch 0) converges: rows that
survived under a later batch id are dropped by the hash guard, and
batch 0's partition is rewritten to the same curated content.

Scale notes: the quality/LM/exact stages are map-side over the
micro-batch; the ONE corpus-sized input touched per batch is the
signature table (~100 B/doc — id + MinHash signature + content hash,
never the text). The sink is write-only. That keeps per-batch cost
O(|batch| text + |corpus| signatures), the viable shape for a corpus
that no longer fits a nightly full re-dedup. The candidate-level drop
for new-vs-corpus pairs is signature-only (no Jaccard verify — the
corpus text is deliberately not read); band/hash counts tune the
false-positive rate, and borderline losses are dedup-conservative
(drop, never duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from mpg_data_warehouse_spark.operators.dedup import (
    content_hash,
    incremental_minhash_pairs,
    minhash_signatures,
)
from mpg_data_warehouse_spark.operators.text import (
    doc_logprob_score,
    normalize_text,
    quality_classifier_scores,
    quality_score,
)
from mpg_data_warehouse_spark.sources import txlog
from mpg_data_warehouse_spark.streaming.events import _sink_exists
from mpg_data_warehouse_spark.streaming.txlog_sink import (
    _AlreadyCommitted,
    _commit_batch,
)

__all__ = ["curated_append_stream"]


def curated_append_stream(
    docs: DataFrame,
    sink_path: str,
    sig_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    min_quality: float = 0.5,
    jaccard_threshold_bands: tuple[int, int] = (8, 4),
    shingle_n: int = 3,
    lm_model: tuple[DataFrame, float] | None = None,
    max_nll_per_token: float | None = None,
    classifier: tuple[DataFrame, float] | None = None,
    min_classifier_p: float | None = None,
    sink_format: str = "parquet",
    app_id: str = "curation",
):
    """Start the continual-curation stream over a streaming ``docs``
    DataFrame (availableNow trigger: drain, then stop — rerun per
    ingest cycle with the same checkpoint to process only new files).

    ``jaccard_threshold_bands`` is (num_hashes, bands) for the MinHash
    signatures — must match the values the signature table was built
    with (validated against the table's actual signature width).

    Input ``docs`` must not already carry a ``batch`` column — both
    output tables are partitioned by it (parquet mode).

    ``sink_format="txlog"`` lands both the curated corpus and the
    signature table in ACID transaction-log tables
    (``sources/txlog``) with the Delta-style ``txn`` action
    (``streaming/txlog_sink``): a replayed batch whose
    ``(app_id, batch_id)`` is already in the log is skipped
    atomically — no partition-overwrite layout needed — and
    downstream incremental consumers get a change feed
    (``txlog.read_changes``) over the curated corpus for free.
    Signature rows carry ``(_app, _batch)`` so a RETRY of an
    interrupted batch excludes its own half-landed signatures from
    the dedup guards (the txlog analogue of parquet mode's
    ``batch != batch_id`` partition filter) — commits are atomic, so
    no other partial state can exist. Signatures still commit before
    docs: an abandoned half batch errs dedup-conservative. On
    checkpoint loss, restart with a FRESH ``app_id`` (standard Delta
    streaming-sink semantics — batch ids restart at 0 and the txn
    guard would skip them): already-curated content is then dropped
    by the id/hash guards and nothing duplicates."""
    if sink_format not in ("parquet", "txlog"):
        raise ValueError(
            f"sink_format must be 'parquet' or 'txlog', got {sink_format!r}"
        )
    if (classifier is None) != (min_classifier_p is None):
        raise ValueError(
            "classifier and min_classifier_p must be passed together — "
            "one without the other would silently skip the trained gate"
        )
    if (lm_model is None) != (max_nll_per_token is None):
        raise ValueError(
            "lm_model and max_nll_per_token must be passed together — "
            "one without the other would silently skip the LM gate"
        )
    num_hashes, bands = jaccard_threshold_bands
    sig_cols = [f"sig_{i}" for i in range(num_hashes)]

    def curate_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last_by_table: dict[str, int | None] = {}
        if sink_format == "txlog":
            # Fast-path replay guard (same as txlog_sink's writer):
            # a batch that fully committed but lost its checkpoint
            # ack would otherwise re-run the whole curation pipeline
            # and write both tables' data files before the in-commit
            # guard abandons them as orphans. The authoritative check
            # still runs inside each commit; the per-table verdicts
            # fetched here are REUSED by the write loop so the commit
            # metadata is scanned once per table per batch, not three
            # times.
            from mpg_data_warehouse_spark.streaming.txlog_sink import (
                last_committed_batch,
            )

            last_by_table = {
                t: (
                    last_committed_batch(t, app_id)
                    if txlog.latest_version(t) >= 0
                    else None
                )
                for t in (sig_path, sink_path)
            }
            if all(
                lb is not None and batch_id <= lb
                for lb in last_by_table.values()
            ):
                return
        if normalize:
            # Canonicalize BEFORE hashing/signatures: unicode variants
            # of identical text must collide in every dedup guard.
            batch_df = normalize_text(batch_df, text_col)
        kept = (
            batch_df.withColumn("_q", quality_score(text_col))
            .filter(F.col("_q") >= min_quality)
            .drop("_q")
        )
        if classifier is not None and min_classifier_p is not None:
            # Trained quality gate (NB log-odds weights +
            # quality_classifier_scores): the weight table broadcasts,
            # so the stage stays map-side over the micro-batch.
            weights, bias = classifier
            liked = quality_classifier_scores(
                kept, weights, bias=bias, id_col=id_col, text_col=text_col,
                threshold=min_classifier_p,
            ).filter(F.col("quality_keep"))
            kept = kept.join(liked.select(id_col), id_col, "left_semi")
        if lm_model is not None and max_nll_per_token is not None:
            model, oov_logp = lm_model
            # anti-join on scored FAILURES (batch-parity with
            # curate_corpus_pipeline's r9 fix): zero-token docs are
            # absent from the scorer's output and must PASS — a
            # semi-join on passes would drop them here while the
            # batch pipeline keeps them, and the two corpora diverge
            influent = doc_logprob_score(
                kept, model, oov_logp, id_col=id_col, text_col=text_col
            ).filter(F.col("nll_per_token") > max_nll_per_token)
            kept = kept.join(
                influent.select(id_col), id_col, "left_anti"
            )
        canon = (
            kept.withColumn("_h", content_hash(text_col))
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("_h").orderBy(id_col)
                ),
            )
            .filter(F.col("_rk") == 1)
            .drop("_rk")
            # materialize the gate chain ONCE: canon feeds both the
            # signature branch (via incremental_minhash_pairs) and the
            # survivor branch — without the cut each branch re-runs
            # normalize → quality → gates → exact dedup per batch
            .localCheckpoint()
        )
        if sink_format == "txlog":
            sig_table_exists = txlog.latest_version(sig_path) >= 0
        else:
            sig_table_exists = _sink_exists(spark, sig_path)
        if sig_table_exists:
            # The ONE corpus-sized side input. Excluding the current
            # batch id is a partition filter (pruned scan), and it is
            # what makes retries safe: a half-written previous attempt
            # of THIS batch can never shadow its own rows. txlog mode:
            # same exclusion via the (_app, _batch) columns — commits
            # are atomic, so the only possible self-state is a fully
            # committed signature batch from an interrupted attempt.
            if sink_format == "txlog":
                corpus_sigs = (
                    txlog.read(spark, sig_path)
                    .filter(
                        ~(
                            (F.col("_app") == app_id)
                            & (F.col("_batch") == batch_id)
                        )
                    )
                    .drop("_app", "_batch")
                )
            else:
                corpus_sigs = spark.read.parquet(sig_path).filter(
                    F.col("batch") != batch_id
                )
            found = [c for c in corpus_sigs.columns if c.startswith("sig_")]
            if len(found) != num_hashes or "_h" not in corpus_sigs.columns:
                raise ValueError(
                    f"signature table at {sig_path} has columns "
                    f"{corpus_sigs.columns}; expected {num_hashes} sig_i "
                    "columns plus _h — jaccard_threshold_bands must match "
                    "the values the table was built with"
                )
            # Replay guard (same id re-delivered under a new batch id)
            # + exact dedup vs corpus (same content hash) — both served
            # from the signature table; the sink is never read.
            canon = canon.join(
                corpus_sigs.select(id_col), id_col, "left_anti"
            ).join(corpus_sigs.select("_h"), "_h", "left_anti")
        else:
            # Bootstrap: empty frame whose schema (including the actual
            # id dtype — long, string, ...) derives from the batch
            # itself, never from a hardcoded DDL string.
            corpus_sigs = None
        band_input = (
            corpus_sigs.select(id_col, *sig_cols)
            if corpus_sigs is not None
            else minhash_signatures(
                canon.limit(0), id_col, text_col, num_hashes, shingle_n
            )
        )
        new_sigs, pairs = incremental_minhash_pairs(
            band_input,
            canon,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        )
        # Monotonic-id contract: the drop side of every candidate pair
        # is the higher id == the newer doc.
        drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
        # Pin the sink column order (joins reorder columns; a write
        # whose file schema-order differs makes later reads
        # order-unstable).
        survivors = (
            canon.join(drops, id_col, "left_anti")
            .select(*batch_df.columns, "_h")
            .localCheckpoint()
        )
        surviving_sigs = new_sigs.join(
            survivors.select(id_col, "_h"), id_col
        ).select(id_col, *sig_cols, "_h")
        if sink_format == "txlog":
            # Exactly-once via the txn action: each table's commit
            # atomically records (app_id, batch_id); a replay that
            # finds its id already committed skips that table and
            # proceeds to the next, so a crash between the two
            # commits converges on retry. Signatures commit FIRST so
            # an abandoned half batch errs dedup-conservative.
            sig_out = surviving_sigs.withColumn(
                "_app", F.lit(app_id)
            ).withColumn("_batch", F.lit(batch_id).cast("long"))
            for table, frame in (
                (sig_path, sig_out),
                (sink_path, survivors),
            ):
                if txlog.latest_version(table) < 0:
                    txlog.create(spark, table, frame.limit(0))
                # per-table fast path: a retry after a crash between
                # the two commits skips re-writing the table that
                # already landed (in-commit guard stays authoritative;
                # verdict reused from the top-of-batch fetch)
                last = last_by_table.get(table)
                if last is not None and batch_id <= last:
                    continue
                state = txlog.snapshot_state(table)
                txlog._check_schema(state, frame)
                adds = txlog._write_data_files(
                    frame, table, state["partition_by"]
                )
                try:
                    _commit_batch(
                        table, app_id, batch_id, "stream-append", adds
                    )
                except _AlreadyCommitted:
                    pass
            return
        # Idempotent per-batch partition overwrite: a retried batch
        # (same batch id) rewrites exactly its own partition of both
        # tables, so there is no append-twice window and no write
        # ordering hazard. Signatures still go first so an abandoned
        # half batch errs dedup-conservative (sigs without docs block
        # re-ingest of the same content; the reverse would leave sink
        # docs invisible to future dedup).
        surviving_sigs.write.mode("overwrite").parquet(
            f"{sig_path}/batch={batch_id}"
        )
        survivors.write.mode("overwrite").parquet(
            f"{sink_path}/batch={batch_id}"
        )

    return (
        docs.writeStream.foreachBatch(curate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
