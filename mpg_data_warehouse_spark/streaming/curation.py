"""Continual corpus curation as a stream: the batch
``plans.pipelines.curate_corpus_pipeline`` stages re-expressed for
micro-batch ingest, so a growing corpus is curated as it arrives
instead of re-curated from scratch per day.

Per micro-batch (``foreachBatch``):

    quality filter → [optional unigram-LM gate] → in-batch exact
    dedup → replay/exact dedup vs the SINK (content-hash anti-join)
    → incremental MinHash near-dup vs the persisted SIGNATURE TABLE
    (``dedup.incremental_minhash_pairs`` — corpus text never re-read)
    → append survivors to sink + their signatures to the table

Contract: ``id_col`` must be monotonically increasing with arrival
order (ingest sequence numbers). That is what makes the keep-first
policy deterministic — in any candidate pair the lower id is the
earlier doc, so the new side is always the drop side.

Exactly-once-ish: the sink anti-join makes replays harmless for
DOCUMENTS; signatures are guarded the same way (anti-join on id), so
a retried micro-batch converges to the same sink + signature state.

Scale notes: the quality/LM/exact stages are map-side over the
micro-batch; the two corpus-sized inputs touched per batch are the
sink KEY+HASH columns (column-pruned scan) and the signature table
(~100 B/doc — not the text). That keeps per-batch cost
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
)
from mpg_data_warehouse_spark.operators.text import (
    doc_logprob_score,
    quality_score,
)
from mpg_data_warehouse_spark.streaming.events import _sink_exists

__all__ = ["curated_append_stream"]


def curated_append_stream(
    docs: DataFrame,
    sink_path: str,
    sig_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    jaccard_threshold_bands: tuple[int, int] = (8, 4),
    shingle_n: int = 3,
    lm_model: tuple[DataFrame, float] | None = None,
    max_nll_per_token: float | None = None,
):
    """Start the continual-curation stream over a streaming ``docs``
    DataFrame (availableNow trigger: drain, then stop — rerun per
    ingest cycle with the same checkpoint to process only new files).

    ``jaccard_threshold_bands`` is (num_hashes, bands) for the MinHash
    signatures — must match the values the signature table was built
    with (the table is created on first batch if absent)."""
    num_hashes, bands = jaccard_threshold_bands

    def curate_batch(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        kept = (
            batch_df.withColumn("_q", quality_score(text_col))
            .filter(F.col("_q") >= min_quality)
            .drop("_q")
        )
        if lm_model is not None and max_nll_per_token is not None:
            model, oov_logp = lm_model
            fluent = doc_logprob_score(
                kept, model, oov_logp, id_col=id_col, text_col=text_col
            ).filter(F.col("nll_per_token") <= max_nll_per_token)
            kept = kept.join(
                fluent.select(id_col), id_col, "left_semi"
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
        )
        if _sink_exists(spark, sink_path):
            existing = spark.read.parquet(sink_path).select(
                F.col(id_col), F.col("_h")
            )
            # replay guard (same id) + exact dedup vs corpus (same hash)
            canon = canon.join(
                existing.select(id_col), id_col, "left_anti"
            ).join(existing.select("_h"), "_h", "left_anti")
        if _sink_exists(spark, sig_path):
            corpus_sigs = spark.read.parquet(sig_path)
        else:
            schema = ", ".join(
                [f"{id_col} long"]
                + [f"sig_{i} long" for i in range(num_hashes)]
            )
            corpus_sigs = spark.createDataFrame([], schema)
        new_sigs, pairs = incremental_minhash_pairs(
            corpus_sigs,
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
        # Pin the sink column order (joins reorder columns; an append
        # whose file schema-order differs — even a zero-row replay
        # part — makes later reads order-unstable).
        survivors = (
            canon.join(drops, id_col, "left_anti")
            .select(*batch_df.columns, "_h")
            .localCheckpoint()
        )
        surviving_sigs = new_sigs.join(
            survivors.select(id_col), id_col, "left_semi"
        ).join(corpus_sigs.select(id_col), id_col, "left_anti")
        # Signatures BEFORE documents: if the batch dies between the
        # two writes, the retry sees its own sigs as corpus rows —
        # self-pairs are excluded by the id_a < id_b filter, the
        # anti-join above skips re-appending them, and the documents
        # land on the retry. The reverse order would strand sink docs
        # without signatures (invisible to future dedup) forever.
        surviving_sigs.write.mode("append").parquet(sig_path)
        survivors.write.mode("append").parquet(sink_path)

    return (
        docs.writeStream.foreachBatch(curate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
