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
