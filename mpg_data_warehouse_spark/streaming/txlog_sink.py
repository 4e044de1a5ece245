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


class _AlreadyCommitted(Exception):
    """Signal: this batch id landed in the log while we were writing."""


def _commit_batch(
    table: str,
    app_id: str,
    batch_id: int,
    op: str,
    adds: list[dict],
    conflict_check=None,
) -> int:
    """Commit with the replay guard INSIDE the build closure: the
    check runs against the same fresh log state the commit's version
    slot comes from, so two zombie drivers replaying one batch cannot
    both land — the loser's retry re-reads the log, sees the winner's
    txn, and skips. (Checking once before the write would leave a
    window where both proceed and the loser blindly re-commits at the
    next slot — a double write.)"""

    def build(s: dict) -> dict:
        last = last_committed_batch(table, app_id)
        if last is not None and batch_id <= last:
            raise _AlreadyCommitted()
        removed: set[str] = set()
        if conflict_check is not None:
            removed = conflict_check(s)
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
            return  # fast path; the authoritative check re-runs in-commit

        state = txlog.snapshot_state(table)
        try:
            if keys:
                adds, removed, bounds = txlog._plan_merge(
                    spark, table, state, batch_df, keys
                )
                base_files = set(state["files"])
                _commit_batch(
                    table,
                    app_id,
                    batch_id,
                    "stream-merge",
                    adds,
                    conflict_check=lambda s: (
                        txlog._merge_conflict_check(
                            s, base_files, removed, keys, bounds
                        )
                        or removed
                    ),
                )
            else:
                txlog._check_schema(state, batch_df)
                adds = txlog._write_data_files(
                    batch_df, table, state["partition_by"]
                )
                _commit_batch(table, app_id, batch_id, "stream-append", adds)
        except _AlreadyCommitted:
            return  # replayed batch: the original commit already landed

    return write_batch
