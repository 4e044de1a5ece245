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
_MANIFEST = "_manifest.json"  # underscore: invisible to parquet reads


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
    from mpg_data_warehouse_spark.sources.storage import (
        get_storage_backend,
    )

    snap = read_version(spark, versions_dir, version)
    tmp = table_path.rstrip("/") + "__rollback_tmp"
    snap.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(table_path)
    get_storage_backend().delete_prefix(tmp)


def prune_versions(versions_dir: str, keep_last: int) -> list[str]:
    """Retention: delete all but the newest ``keep_last`` snapshots
    (the VACUUM analog for the plain-parquet version store). Returns
    the deleted version ids. Never touches the live table; refuses
    nonsensical retention (keep_last < 1) rather than silently wiping
    every restore point."""
    from mpg_data_warehouse_spark.sources.storage import (
        get_storage_backend,
    )

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (refusing to delete all restore points)")
    versions = list_versions(versions_dir)
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    backend = get_storage_backend()
    for vid in doomed:
        backend.delete_prefix(os.path.join(versions_dir, vid))
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


def _next_version_slot(versions_dir: str) -> str:
    existing = list_versions(versions_dir)
    nxt = 1 + (int(_VER_RE.match(existing[-1]).group(1)) if existing else 0)
    return f"v{nxt:04d}"


def _partition_dir(table_path: str, part_row: dict) -> str:
    """Filesystem path of one partition directory, matching Spark's
    ``col=value`` layout (values taken from a collected Row dict)."""
    from urllib.parse import quote

    segs = [f"{c}={quote(str(v), safe='')}" for c, v in part_row.items()]
    return os.path.join(table_path, *segs)


def snapshot_partitions(
    spark: SparkSession,
    table_path: str,
    versions_dir: str,
    partition_cols: tuple[str, ...],
    touched: list[dict],
) -> str:
    """Partition-SCOPED snapshot: copy only the named partitions (a
    partition-pruned read — never the 100 TB table) into the next
    version slot, partitioned with the table's own layout, plus a
    manifest recording which of the touched partitions existed. The
    manifest is what makes rollback exact: partitions a failed
    mutation CREATED (absent pre-mutation) must be deleted on restore,
    not merely not-overwritten."""
    from pyspark.sql import functions as F

    vid = _next_version_slot(versions_dir)
    dest = os.path.join(versions_dir, vid)
    existing_parts = [
        p for p in touched if os.path.isdir(_partition_dir(table_path, p))
    ]
    if existing_parts:
        pred = None
        for row in existing_parts:
            clause = None
            for c in partition_cols:
                eq = F.col(c) == F.lit(row[c])
                clause = eq if clause is None else (clause & eq)
            pred = clause if pred is None else (pred | clause)
        (
            spark.read.parquet(table_path)
            .filter(pred)
            .write.partitionBy(*partition_cols)
            .parquet(dest)
        )
    else:
        os.makedirs(dest, exist_ok=True)
    from mpg_data_warehouse_spark.sources.storage import write_json_atomic

    write_json_atomic(
        os.path.join(dest, _MANIFEST),
        {
            "partition_cols": list(partition_cols),
            "touched": touched,
            "existed": existing_parts,
        },
    )
    return vid


def rollback_partitions(
    spark: SparkSession,
    table_path: str,
    versions_dir: str,
    version: str,
) -> None:
    """Restore a partition-scoped snapshot: dynamic-overwrite the
    partitions it captured back into the table, and DELETE touched
    partitions that did not exist pre-mutation (the failed mutation
    created them). Untouched partitions' files are never rewritten."""
    from mpg_data_warehouse_spark.operators.append import (
        overwrite_partitions,
    )
    from mpg_data_warehouse_spark.sources.storage import (
        get_storage_backend,
        read_json,
    )

    vdir = os.path.join(versions_dir, version)
    manifest = read_json(os.path.join(vdir, _MANIFEST))
    part_cols = tuple(manifest["partition_cols"])
    existed = manifest["existed"]
    if existed:
        overwrite_partitions(
            spark, spark.read.parquet(vdir), table_path, part_cols
        )
    existed_dirs = {_partition_dir(table_path, p) for p in existed}
    backend = get_storage_backend()
    for p in manifest["touched"]:
        d = _partition_dir(table_path, p)
        if d not in existed_dirs:
            backend.delete_prefix(d)


def merge_upsert_with_backup(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str,
    versions_dir: str,
    keys: list[str],
) -> tuple[str, DataFrame]:
    """``append.merge_upsert`` wrapped in snapshot-before / rollback-
    on-failure (the reference's documented recipe for its UPDATE-class
    mutations, notebooks/update_gridVeg_survey_metadata.ipynb:
    1392-1402). Returns ``(snapshot_id, merged_frame)``."""
    from mpg_data_warehouse_spark.operators.append import merge_upsert

    result: list[DataFrame] = []
    vid = mutate_with_backup(
        spark,
        table_path,
        versions_dir,
        lambda: result.append(merge_upsert(spark, updates, table_path, keys)),
    )
    return vid, result[0]


def merge_upsert_partitioned_with_backup(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str,
    versions_dir: str,
    keys: list[str],
    partition_cols: tuple[str, ...] = ("year",),
    check_partition_stable: bool = True,
) -> tuple[str, DataFrame]:
    """Partition-scoped MERGE with partition-scoped backup: snapshot
    ONLY the partitions the batch touches (the same pruned set the
    merge itself rewrites), run the merge, and on any failure restore
    exactly those partitions — including deleting ones the failed
    merge created. Backup cost scales with the batch's partition
    footprint, never the table: this is what keeps
    backup-before-mutation viable when the table is 100 TB and the
    repair touches three seasons. Returns ``(snapshot_id, merged)``."""
    from mpg_data_warehouse_spark.operators.append import (
        merge_upsert_partitioned,
    )

    touched = [
        r.asDict()
        for r in updates.select(*partition_cols).distinct().collect()
    ]
    vid = snapshot_partitions(
        spark, table_path, versions_dir, partition_cols, touched
    )
    try:
        merged = merge_upsert_partitioned(
            spark,
            updates,
            table_path,
            keys,
            partition_cols,
            check_partition_stable,
        )
    except Exception:
        rollback_partitions(spark, table_path, versions_dir, vid)
        raise
    return vid, merged


# ---------------------------------------------------------------------------
# Snapshot diff — "what changed between v0007 and now?" The reference
# answered this by eyeballing row counts before/after each mutation
# (notebooks/update_gridVeg_survey_metadata.ipynb:1392-1402's manual
# verify step); table_diff makes it a first-class distributed op and
# the building block for audit trails over merge_upsert batches.
# ---------------------------------------------------------------------------


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level change-data-capture between two table states.

    Output: ``(keys..., change)`` with ``change`` ∈ ``added`` (key only
    in ``new``), ``removed`` (only in ``old``), ``changed`` (both, but
    any compared column differs). Unchanged keys are not emitted.
    Keys must identify rows uniquely (the same primary-key contract
    MERGE itself requires).

    Scale shape: each side collapses map-side to ``(keys, xxhash64 of
    compared columns)`` BEFORE the join, so the only shuffle moves
    fixed-width key+hash rows — payload bytes never travel. The join
    is a key-partitioned full outer; null-safe hashing (distinct null
    vs empty-string) comes free from hashing the struct, not a
    string concat.
    """
    from pyspark.sql import functions as F

    cand = compare_cols or [c for c in old.columns if c not in keys]
    cmp_cols = [c for c in cand if c in new.columns]
    o = old.select(*keys, F.xxhash64(F.struct(*cmp_cols)).alias("_oh"))
    n = new.select(*keys, F.xxhash64(F.struct(*cmp_cols)).alias("_nh"))
    joined = o.join(n, keys, "full_outer")
    return joined.filter(
        F.col("_oh").isNull()
        | F.col("_nh").isNull()
        | (F.col("_oh") != F.col("_nh"))
    ).select(
        *keys,
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


def diff_versions(
    spark: SparkSession,
    versions_dir: str,
    old_version: str,
    new_version: str | None = None,
    keys: list[str] | None = None,
    table_path: str | None = None,
) -> DataFrame:
    """``table_diff`` between two snapshot versions (or a snapshot and
    the live table when ``new_version`` is None and ``table_path`` is
    given). ``keys`` is required; kept explicit because only the
    caller knows the table's primary key."""
    if keys is None:
        raise ValueError("keys is required")
    old = read_version(spark, versions_dir, old_version)
    if new_version is not None:
        new = read_version(spark, versions_dir, new_version)
    elif table_path is not None:
        new = spark.read.parquet(table_path)
    else:
        raise ValueError("need new_version or table_path")
    return table_diff(old, new, keys)
