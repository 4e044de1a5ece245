"""Continual-curation stream: micro-batch quality gate + exact dedup
+ incremental near-dup against the persisted signature table, with
checkpoint-resume and full-replay idempotency."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from mpg_data_warehouse_spark.streaming.curation import curated_append_stream

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different long form content about databases " * 3
THIRD = "a third entirely unrelated document concerning orbital mechanics " * 3


def _stream(spark, src):
    return spark.readStream.schema(DOCS_SCHEMA).parquet(src)


def _run(spark, src, paths):
    q = curated_append_stream(
        _stream(spark, src), paths["sink"], paths["sigs"], paths["ckpt"]
    )
    q.awaitTermination(180)


def test_curated_stream_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    batch_a = spark.createDataFrame(
        [
            (1, BASE * 3, "web"),
            (2, BASE * 3, "web"),     # exact dup of 1 (in-batch)
            (3, "shrt", "web"),       # fails the quality gate
            (4, OTHER, "books"),
        ],
        DOCS_SCHEMA,
    )
    batch_a.write.parquet(src)
    _run(spark, src, paths)

    sink_ids = {r.doc_id for r in spark.read.parquet(paths["sink"]).collect()}
    assert sink_ids == {1, 4}

    # Batch B arrives: token-identical near-dup of 1 (same shingle
    # set, different raw hash), a fresh doc, and a cross-batch exact
    # dup of 4.
    batch_b = spark.createDataFrame(
        [
            (5, BASE * 3 + " ", "web"),   # near-dup of 1
            (6, THIRD, "papers"),
            (7, OTHER, "books"),          # exact dup of 4, new id
        ],
        DOCS_SCHEMA,
    )
    batch_b.write.mode("append").parquet(src)
    _run(spark, src, paths)

    sink = spark.read.parquet(paths["sink"])
    assert {r.doc_id for r in sink.collect()} == {1, 4, 6}
    # signature table tracks exactly the surviving docs
    sig_ids = {r.doc_id for r in spark.read.parquet(paths["sigs"]).collect()}
    assert sig_ids == {1, 4, 6}


def test_curated_stream_full_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    spark.createDataFrame(
        [(1, BASE * 3, "web"), (2, OTHER, "books")], DOCS_SCHEMA
    ).write.parquet(src)
    _run(spark, src, paths)
    first = sorted(
        tuple(r) for r in spark.read.parquet(paths["sink"]).collect()
    )

    # Lose the checkpoint (the at-least-once disaster case): the whole
    # source replays, and the sink/signature guards absorb it.
    paths_replay = dict(paths, ckpt=str(tmp_path / "ckpt2"))
    _run(spark, src, paths_replay)
    again = sorted(
        tuple(r) for r in spark.read.parquet(paths["sink"]).collect()
    )
    assert again == first
    sigs = spark.read.parquet(paths["sigs"])
    assert sigs.count() == sigs.select("doc_id").distinct().count() == 2


def test_curated_stream_never_reads_sink(spark, tmp_path):
    """Cross-batch exact + near dedup must be served entirely from the
    signature table: delete the sink between batches and the second
    batch still drops corpus duplicates."""
    import shutil

    src = str(tmp_path / "src")
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    spark.createDataFrame(
        [(1, BASE * 3, "web"), (2, OTHER, "books")], DOCS_SCHEMA
    ).write.parquet(src)
    _run(spark, src, paths)
    shutil.rmtree(paths["sink"])

    spark.createDataFrame(
        [
            (5, BASE * 3 + " ", "web"),  # near-dup of 1 (sig match)
            (6, THIRD, "papers"),
            (7, OTHER, "books"),         # exact dup of 2 (_h match)
        ],
        DOCS_SCHEMA,
    ).write.mode("append").parquet(src)
    _run(spark, src, paths)

    sink_ids = {r.doc_id for r in spark.read.parquet(paths["sink"]).collect()}
    assert sink_ids == {6}
    sig_ids = {r.doc_id for r in spark.read.parquet(paths["sigs"]).collect()}
    assert sig_ids == {1, 2, 6}


def test_curated_stream_rejects_band_mismatch(spark, tmp_path):
    """A signature table built with a different num_hashes must raise,
    not silently degrade dedup."""
    import pytest

    src = str(tmp_path / "src")
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    spark.createDataFrame(
        [(1, BASE * 3, "web")], DOCS_SCHEMA
    ).write.parquet(src)
    _run(spark, src, paths)  # builds the table with (8, 4)

    spark.createDataFrame(
        [(2, OTHER, "books")], DOCS_SCHEMA
    ).write.mode("append").parquet(src)
    from mpg_data_warehouse_spark.streaming.curation import (
        curated_append_stream,
    )
    q = curated_append_stream(
        _stream(spark, src),
        paths["sink"],
        paths["sigs"],
        str(tmp_path / "ckpt2"),
        jaccard_threshold_bands=(16, 8),
    )
    with pytest.raises(Exception, match="sig_i columns"):
        q.awaitTermination(180)
        q.stop()


def test_curated_stream_classifier_gate(spark, tmp_path):
    """The optional trained-classifier stage drops docs the weight
    table scores below threshold, before any dedup state is written."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.text import nb_term_weights

    pos = spark.createDataFrame(
        [Row(doc_id=i, text=BASE + f" variant {i}") for i in range(3)]
    )
    neg = spark.createDataFrame(
        [
            Row(doc_id=i, text="spam spam buy buy click subscribe now " * 3)
            for i in range(3)
        ]
    )
    weights, bias = nb_term_weights(pos, neg)

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE + " fresh words", source="a"),
            Row(
                doc_id=2,
                text="spam spam buy buy click subscribe now forever " * 2,
                source="a",
            ),
        ],
        DOCS_SCHEMA,
    ).write.parquet(src)
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    q = curated_append_stream(
        _stream(spark, src),
        paths["sink"],
        paths["sigs"],
        paths["ckpt"],
        classifier=(weights, bias),
        min_classifier_p=0.5,
    )
    q.awaitTermination(180)
    kept = {r.doc_id for r in spark.read.parquet(paths["sink"]).collect()}
    assert kept == {1}


def _run_txlog(spark, src, paths, app_id="curation"):
    q = curated_append_stream(
        _stream(spark, src),
        paths["sink"],
        paths["sigs"],
        paths["ckpt"],
        sink_format="txlog",
        app_id=app_id,
    )
    q.awaitTermination(180)


def test_curated_stream_txlog_sink_dedups_and_feeds_cdf(spark, tmp_path):
    """txlog-mode curation: same curation semantics, ACID sink, and a
    change feed downstream incremental consumers can read."""
    from mpg_data_warehouse_spark.sources import txlog

    src = str(tmp_path / "src")
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    batch_a = spark.createDataFrame(
        [
            (1, BASE * 3, "web"),
            (2, BASE * 3, "web"),  # exact dup of 1 (in-batch)
            (3, "shrt", "web"),    # fails the quality gate
            (4, OTHER, "books"),
        ],
        DOCS_SCHEMA,
    )
    batch_a.write.parquet(src)
    _run_txlog(spark, src, paths)
    v_after_a = txlog.latest_version(paths["sink"])
    assert {
        r.doc_id for r in txlog.read(spark, paths["sink"]).collect()
    } == {1, 4}

    batch_b = spark.createDataFrame(
        [
            (5, BASE * 3 + " ", "web"),  # near-dup of 1
            (6, THIRD, "papers"),
            (7, OTHER, "books"),         # exact dup of 4, new id
        ],
        DOCS_SCHEMA,
    )
    batch_b.write.mode("append").parquet(src)
    _run_txlog(spark, src, paths)

    assert {
        r.doc_id for r in txlog.read(spark, paths["sink"]).collect()
    } == {1, 4, 6}
    sig_ids = {
        r.doc_id for r in txlog.read(spark, paths["sigs"]).collect()
    }
    assert sig_ids == {1, 4, 6}
    # CDF: the commits after batch A insert exactly doc 6
    changes = txlog.read_changes(
        spark, paths["sink"], v_after_a, txlog.latest_version(paths["sink"])
    )
    assert [(r.doc_id, r._change_type) for r in changes.collect()] == [
        (6, "insert")
    ]


def test_curated_stream_txlog_replayed_batch_adds_zero_rows(
    spark, tmp_path
):
    """Deleting the checkpoint and re-running with a FRESH app_id
    re-delivers every source file; the txn guard plus the id/hash
    guards must land zero new rows and zero new data files."""
    import shutil

    from mpg_data_warehouse_spark.sources import txlog

    src = str(tmp_path / "src")
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    spark.createDataFrame(
        [(1, BASE * 3, "web"), (4, OTHER, "books")], DOCS_SCHEMA
    ).write.parquet(src)
    _run_txlog(spark, src, paths)
    before = txlog.read(spark, paths["sink"]).count()
    assert before == 2

    # Disaster replay: checkpoint lost, batch ids restart at 0 — the
    # documented recovery is a fresh app_id (Delta semantics).
    shutil.rmtree(paths["ckpt"])
    paths["ckpt"] = str(tmp_path / "ckpt2")
    _run_txlog(spark, src, paths, app_id="curation-reborn")
    sink = txlog.read(spark, paths["sink"])
    assert sink.count() == before
    assert {r.doc_id for r in sink.collect()} == {1, 4}

    # Same-checkpoint re-run (no new files): stream delivers nothing,
    # tables untouched.
    head = txlog.latest_version(paths["sink"])
    _run_txlog(spark, src, paths, app_id="curation-reborn")
    assert txlog.read(spark, paths["sink"]).count() == before
    assert txlog.latest_version(paths["sink"]) == head


def test_curated_stream_lm_gate_keeps_unscoreable_docs(spark, tmp_path):
    """r9 review: the stream's LM gate must match the batch
    pipeline's anti-join-on-failures semantics — a zero-token doc has
    no unigram score, is absent from the scorer's output, and must
    PASS the gate (it is not influent), not be dropped by a semi-join
    on scored passes."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.text import unigram_lm

    train = spark.createDataFrame(
        [Row(doc_id=i, text=BASE + f" variant {i}") for i in range(3)]
    )
    model = unigram_lm(train, vocab_size=50)

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE + " fresh words", source="a"),
            Row(doc_id=2, text="", source="a"),  # zero tokens
        ],
        DOCS_SCHEMA,
    ).write.parquet(src)
    paths = {
        "sink": str(tmp_path / "sink"),
        "sigs": str(tmp_path / "sigs"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    q = curated_append_stream(
        _stream(spark, src),
        paths["sink"],
        paths["sigs"],
        paths["ckpt"],
        min_quality=0.0,
        lm_model=model,
        max_nll_per_token=1e9,
    )
    q.awaitTermination(180)
    kept = {r.doc_id for r in spark.read.parquet(paths["sink"]).collect()}
    assert 2 in kept, "zero-token doc dropped by the stream's lm gate"
    assert kept == {1, 2}
