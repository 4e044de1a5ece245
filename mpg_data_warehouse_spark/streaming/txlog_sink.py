"""Exactly-once Structured Streaming sink on the transaction-log
table format (``sources/txlog``).

Structured Streaming's ``foreachBatch`` gives at-least-once: a batch
that fails after a partial write is REPLAYED under the same
``batch_id``. Plain-parquet sinks get idempotence only through
partition-per-batch layouts (see ``streaming/curation.py``); the
txlog sink gets true exactly-once the way Delta's streaming sink does
(Armbrust et al., VLDB 2020, §4.3 — the ``txn`` action): every commit
records ``(app_id, batch_id)``, and a replayed batch whose id is
already in the log is SKIPPED before writing anything. The check and
the data commit are the same atomic log append, so there is no window
where a retry can double-write: either the commit file exists (batch
done) or it doesn't (retry redoes the whole batch).

Two modes:

- ``append``: blind transactional append of each micro-batch.
- ``merge`` (with ``keys``): upsert each micro-batch by key —
  streaming CDC apply with file-level pruning from the txlog MERGE.

Scale: per-batch cost is the txlog op itself (append: write only;
merge: touched files only). The replay check reads commit metadata
newest-first and stops at the first ``txn`` for this app — O(tail),
not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mpg_data_warehouse_spark.sources import txlog


def last_committed_batch(table: str, app_id: str) -> int | None:
    """Newest ``batch_id`` this ``app_id`` has committed, or None.
    Scans commit metadata newest-first; stops at the first match, so a
    long-running stream pays O(commits since its last batch)."""
    head = txlog.latest_version(table)
    for v in range(head, -1, -1):
        txn = txlog._read_commit(table, v).get("txn")
        if txn and txn["app_id"] == app_id:
            return txn["batch_id"]
    return None


def _commit_batch(
    table: str,
    app_id: str,
    batch_id: int,
    op: str,
    removed: set[str],
    adds: list[dict],
) -> int:
    def build(s: dict) -> dict:
        gone = removed - set(s["files"])
        if gone:
            raise txlog.TxConflict(
                f"files rewritten by a concurrent commit: {sorted(gone)}"
            )
        return {
            "op": op,
            "txn": {"app_id": app_id, "batch_id": batch_id},
            "actions": [{"remove": {"path": p}} for p in sorted(removed)]
            + [{"add": a} for a in adds],
        }

    return txlog._commit_retry(table, build)


def foreach_batch_writer(
    table: str,
    app_id: str,
    keys: list[str] | None = None,
):
    """Build the ``foreachBatch`` callback:

        stream.writeStream.foreachBatch(
            foreach_batch_writer(table, "curate-v1", keys=["doc_id"])
        )

    The target table must already exist (``txlog.create`` with the
    stream's schema — possibly from an empty DataFrame); creating it
    inside the callback would race parallel batches.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_committed_batch(table, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: already committed atomically

        state = txlog.snapshot_state(table)
        txlog._check_schema(state, batch_df)
        if keys:
            updates = batch_df.dropDuplicates(keys)
            touched = txlog._touched_files(
                spark, table, state, updates, keys
            )
            if touched:
                from pyspark.sql import functions as F

                current = txlog._read_files(
                    spark, table, state, touched
                ).select(*[F.col(f.name) for f in updates.schema.fields])
                merged = current.join(
                    F.broadcast(updates.select(*keys)),
                    on=keys,
                    how="left_anti",
                ).unionByName(updates)
            else:
                merged = updates
            adds = txlog._write_data_files(
                merged, table, state["partition_by"]
            )
            _commit_batch(
                table, app_id, batch_id, "stream-merge", set(touched), adds
            )
        else:
            adds = txlog._write_data_files(
                batch_df, table, state["partition_by"]
            )
            _commit_batch(table, app_id, batch_id, "stream-append", set(), adds)

    return write_batch
