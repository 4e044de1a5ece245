"""Snapshot / rollback for plain-parquet tables — the reference's
backup-before-mutation + documented manual rollback workflow
(S13 extract-to-GCS backups, src/survey_metadata_update.py:202-221;
rollback recipes notebooks/update_gridVeg_survey_metadata.ipynb:
1392-1402) as first-class engine ops.

A snapshot is a full parquet copy under ``<versions_dir>/v<NNNN>``
with monotonically increasing ids (no timestamps — deterministic and
replayable). On a real deployment a transactional table format
(Delta/Iceberg time travel) subsumes this; the API here matches that
shape so callers can swap backends without change. Copy cost is one
distributed read+write of the table — the same cost the reference
paid for its extract-job backups.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_VER_RE = re.compile(r"^v(\d{4})$")


def list_versions(versions_dir: str) -> list[str]:
    if not os.path.isdir(versions_dir):
        return []
    return sorted(d for d in os.listdir(versions_dir) if _VER_RE.match(d))


def snapshot(spark: SparkSession, table_path: str, versions_dir: str) -> str:
    """Copy the table's current state to the next version slot and
    return the version id (e.g. ``v0001``)."""
    existing = list_versions(versions_dir)
    nxt = 1 + (int(_VER_RE.match(existing[-1]).group(1)) if existing else 0)
    vid = f"v{nxt:04d}"
    dest = os.path.join(versions_dir, vid)
    spark.read.parquet(table_path).write.parquet(dest)
    return vid


def read_version(
    spark: SparkSession, versions_dir: str, version: str
) -> DataFrame:
    """Time-travel read of a snapshot (``VERSION AS OF`` analog)."""
    return spark.read.parquet(os.path.join(versions_dir, version))


def rollback(
    spark: SparkSession, table_path: str, versions_dir: str, version: str
) -> None:
    """Restore the table to a snapshot, staged through a temp path so
    the snapshot is never read while the table is being overwritten."""
    import shutil

    snap = read_version(spark, versions_dir, version)
    tmp = table_path.rstrip("/") + "__rollback_tmp"
    snap.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(table_path)
    shutil.rmtree(tmp, ignore_errors=True)


def prune_versions(versions_dir: str, keep_last: int) -> list[str]:
    """Retention: delete all but the newest ``keep_last`` snapshots
    (the VACUUM analog for the plain-parquet version store). Returns
    the deleted version ids. Never touches the live table; refuses
    nonsensical retention (keep_last < 1) rather than silently wiping
    every restore point."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (refusing to delete all restore points)")
    versions = list_versions(versions_dir)
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    for vid in doomed:
        shutil.rmtree(os.path.join(versions_dir, vid))
    return doomed


def mutate_with_backup(
    spark: SparkSession,
    table_path: str,
    versions_dir: str,
    mutation,
) -> str:
    """The reference's operational pattern as one call: snapshot, then
    run the mutation; on ANY failure roll back to the snapshot and
    re-raise. Returns the snapshot id on success."""
    vid = snapshot(spark, table_path, versions_dir)
    try:
        mutation()
    except Exception:
        rollback(spark, table_path, versions_dir, vid)
        raise
    return vid
