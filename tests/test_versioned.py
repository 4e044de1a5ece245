"""Snapshot / rollback: the backup-before-mutation workflow must
restore byte-equivalent content, and the guarded mutation must
auto-rollback on failure."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mpg_data_warehouse_spark.operators import versioned as V


def _table(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(k=i, v=f"row{i}") for i in range(10)]
    ).write.parquet(p)
    return p


def test_snapshot_rollback_round_trip(spark, tmp_path):
    table = _table(spark, tmp_path)
    vers = str(tmp_path / "versions")
    v1 = V.snapshot(spark, table, vers)
    assert v1 == "v0001"

    # destructive mutation: drop half the rows and add a bogus one
    bad = spark.read.parquet(table).filter("k < 5").unionByName(
        spark.createDataFrame([Row(k=999, v="corrupt")])
    )
    tmp_stage = str(tmp_path / "stage")
    bad.write.parquet(tmp_stage)
    spark.read.parquet(tmp_stage).write.mode("overwrite").parquet(table)
    assert spark.read.parquet(table).count() == 6

    V.rollback(spark, table, vers, v1)
    restored = spark.read.parquet(table)
    assert restored.count() == 10
    assert restored.filter("k = 999").count() == 0
    assert sorted(r.v for r in restored.collect()) == sorted(
        f"row{i}" for i in range(10)
    )


def test_versions_increment_and_time_travel(spark, tmp_path):
    table = _table(spark, tmp_path)
    vers = str(tmp_path / "versions")
    v1 = V.snapshot(spark, table, vers)
    spark.createDataFrame([Row(k=10, v="row10")]).write.mode("append").parquet(table)
    v2 = V.snapshot(spark, table, vers)
    assert V.list_versions(vers) == [v1, v2] == ["v0001", "v0002"]
    assert V.read_version(spark, vers, v1).count() == 10
    assert V.read_version(spark, vers, v2).count() == 11


def test_mutate_with_backup_auto_rollback(spark, tmp_path):
    table = _table(spark, tmp_path)
    vers = str(tmp_path / "versions")

    def bad_mutation():
        # half-applied write, then failure
        spark.createDataFrame([Row(k=777, v="partial")]).write.mode(
            "append"
        ).parquet(table)
        raise RuntimeError("mutation exploded mid-way")

    with pytest.raises(RuntimeError, match="exploded"):
        V.mutate_with_backup(spark, table, vers, bad_mutation)
    # table restored: the partial append is gone
    restored = spark.read.parquet(table)
    assert restored.count() == 10
    assert restored.filter("k = 777").count() == 0


def test_prune_versions_retention(spark, tmp_path):
    import pytest

    from mpg_data_warehouse_spark.operators import versioned as V

    table = str(tmp_path / "t")
    vdir = str(tmp_path / "versions")
    spark.range(5).write.parquet(table)
    for _ in range(4):
        V.snapshot(spark, table, vdir)
    assert V.list_versions(vdir) == ["v0001", "v0002", "v0003", "v0004"]

    deleted = V.prune_versions(vdir, keep_last=2)
    assert deleted == ["v0001", "v0002"]
    assert V.list_versions(vdir) == ["v0003", "v0004"]
    # surviving snapshots still readable; numbering continues upward
    assert V.read_version(spark, vdir, "v0004").count() == 5
    assert V.snapshot(spark, table, vdir) == "v0005"
    with pytest.raises(ValueError):
        V.prune_versions(vdir, keep_last=0)


def _poison(updates):
    """An updates frame whose VALUE column raises at materialization
    time — partition/key columns stay prunable, so the failure fires
    mid-merge (during the staged write), after the backup is taken."""
    from pyspark.sql import functions as F

    return updates.withColumn(
        "v",
        F.when(F.col("k") < 0, F.col("v")).otherwise(
            F.raise_error("injected merge failure")
        ),
    )


def test_merge_upsert_with_backup_rolls_back(spark, tmp_path):
    table = _table(spark, tmp_path)
    vers = str(tmp_path / "versions")
    before = sorted(tuple(r) for r in spark.read.parquet(table).collect())

    updates = spark.createDataFrame([Row(k=3, v="fixed3"), Row(k=42, v="new42")])
    with pytest.raises(Exception, match="injected merge failure"):
        V.merge_upsert_with_backup(
            spark, _poison(updates), table, vers, keys=["k"]
        )
    after = sorted(tuple(r) for r in spark.read.parquet(table).collect())
    assert after == before

    # the same call without poison succeeds and returns the merge
    vid, merged = V.merge_upsert_with_backup(
        spark, updates, table, vers, keys=["k"]
    )
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got[3] == "fixed3" and got[42] == "new42" and len(got) == 11
    assert vid in V.list_versions(vers)


def _part_table(spark, tmp_path):
    p = str(tmp_path / "pt")
    spark.createDataFrame(
        [Row(k=i, v=f"row{i}", year=2019 + (i % 2)) for i in range(10)]
    ).write.partitionBy("year").parquet(p)
    return p


def test_merge_partitioned_with_backup_rolls_back_exactly(spark, tmp_path):
    import glob
    import os

    table = _part_table(spark, tmp_path)
    vers = str(tmp_path / "versions")
    before = sorted(
        tuple(r) for r in spark.read.parquet(table).select("k", "v", "year").collect()
    )
    untouched_files = sorted(glob.glob(os.path.join(table, "year=2019", "*")))

    # batch touches year=2020 (existing) and year=2021 (created by the
    # failed merge — rollback must delete it, not leave it behind)
    updates = spark.createDataFrame(
        [Row(k=1, v="fix1", year=2020), Row(k=100, v="new", year=2021)]
    )
    with pytest.raises(Exception, match="injected merge failure"):
        V.merge_upsert_partitioned_with_backup(
            spark, _poison(updates), table, vers, keys=["k"],
            partition_cols=("year",),
        )
    after = sorted(
        tuple(r) for r in spark.read.parquet(table).select("k", "v", "year").collect()
    )
    assert after == before
    assert not os.path.isdir(os.path.join(table, "year=2021"))
    # partition-scoped: the untouched partition's files were never rewritten
    assert sorted(glob.glob(os.path.join(table, "year=2019", "*"))) == untouched_files
    # and the snapshot captured only the touched, pre-existing partition
    vdir = os.path.join(vers, V.list_versions(vers)[-1])
    assert os.path.isdir(os.path.join(vdir, "year=2020"))
    assert not os.path.isdir(os.path.join(vdir, "year=2019"))

    vid, merged = V.merge_upsert_partitioned_with_backup(
        spark, updates, table, vers, keys=["k"], partition_cols=("year",),
    )
    got = {r.k: (r.v, r.year) for r in spark.read.parquet(table).collect()}
    assert got[1] == ("fix1", 2020) and got[100] == ("new", 2021)
    assert len(got) == 11


# --- table_diff / diff_versions (CDC between snapshots) ---


def test_table_diff_classifies_changes(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.versioned import table_diff

    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),
            Row(k=2, a="y", b=20),
            Row(k=3, a="z", b=30),
            Row(k=4, a=None, b=40),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=10),      # unchanged -> not emitted
            Row(k=2, a="y2", b=20),     # changed
            Row(k=4, a=None, b=40),     # unchanged (null-safe)
            Row(k=5, a="new", b=50),    # added
        ]
    )
    got = {r.k: r.change for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_table_diff_respects_compare_cols(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.versioned import table_diff

    old = spark.createDataFrame([Row(k=1, a="x", audit="t1")])
    new = spark.createDataFrame([Row(k=1, a="x", audit="t2")])
    assert table_diff(old, new, ["k"], compare_cols=["a"]).count() == 0
    assert (
        table_diff(old, new, ["k"]).collect()[0].change == "changed"
    )


def test_diff_versions_snapshot_to_live(spark, tmp_path):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.versioned import (
        diff_versions,
        snapshot,
    )

    table = str(tmp_path / "t")
    versions = str(tmp_path / "versions")
    spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]).write.parquet(
        table
    )
    vid = snapshot(spark, table, versions)
    spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="B"), Row(k=3, v="c")]) \
        .write.mode("overwrite").parquet(table)
    got = {
        r.k: r.change
        for r in diff_versions(
            spark, versions, vid, keys=["k"], table_path=table
        ).collect()
    }
    assert got == {2: "changed", 3: "added"}
