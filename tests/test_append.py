"""Idempotent anti-join append (reference J6/S9/A11): run-twice
appends zero, reconciliation holds, composite keys join natively."""

from __future__ import annotations

from pyspark.sql import Row

from mpg_data_warehouse_spark.operators.append import (
    anti_join_append,
    new_only,
    truncate_replace,
)


def _existing(spark):
    return spark.createDataFrame(
        [
            Row(survey_ID="a", transect_point="N1", year=2024, v=1.0),
            Row(survey_ID="a", transect_point="N2", year=2024, v=2.0),
            Row(survey_ID="b", transect_point="E1", year=2025, v=3.0),
        ]
    )


def _batch(spark):
    # 2 duplicate keys, 2 new (one new transect on an old survey —
    # composite key must distinguish it).
    return spark.createDataFrame(
        [
            Row(survey_ID="a", transect_point="N1", year=2024, v=1.0),
            Row(survey_ID="b", transect_point="E1", year=2025, v=3.0),
            Row(survey_ID="a", transect_point="N3", year=2024, v=4.0),
            Row(survey_ID="c", transect_point="W9", year=2025, v=5.0),
        ]
    )


def test_new_only_composite_key(spark):
    got = new_only(_batch(spark), _existing(spark), ["survey_ID", "transect_point"])
    keys = {(r.survey_ID, r.transect_point) for r in got.collect()}
    assert keys == {("a", "N3"), ("c", "W9")}


def test_append_then_idempotent(spark, tmp_path):
    table = str(tmp_path / "tbl")
    _existing(spark).write.parquet(table)

    res = anti_join_append(spark, _batch(spark), table, ["survey_ID", "transect_point"])
    assert res.appended_rows == 2
    assert res.duplicate_rows == 2
    assert res.reconciled
    assert res.actual_rows == 5

    # Re-running the same batch appends 0 (reference §5 idempotence).
    res2 = anti_join_append(spark, _batch(spark), table, ["survey_ID", "transect_point"])
    assert res2.appended_rows == 0
    assert res2.actual_rows == 5
    assert res2.reconciled


def test_truncate_replace_reads_own_source(spark, tmp_path):
    """Read-modify-replace on the same path (the fix-NA flow)."""
    table = str(tmp_path / "tbl2")
    _existing(spark).write.parquet(table)
    df = spark.read.parquet(table).filter("year = 2024")
    rows = truncate_replace(spark, df, table)
    assert rows == 2
    assert spark.read.parquet(table).count() == 2


def test_merge_upsert(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.append import merge_upsert

    table = str(tmp_path / "m")
    _existing(spark).write.parquet(table)
    updates = spark.createDataFrame(
        [
            Row(survey_ID="a", transect_point="N1", year=2024, v=99.0),  # update
            Row(survey_ID="z", transect_point="S1", year=2026, v=7.0),   # insert
        ]
    )
    out = merge_upsert(spark, updates, table, ["survey_ID", "transect_point"])
    rows = {(r.survey_ID, r.transect_point): r.v for r in out.collect()}
    assert rows[("a", "N1")] == 99.0        # matched -> updated
    assert rows[("a", "N2")] == 2.0         # untouched passes through
    assert rows[("z", "S1")] == 7.0         # new -> inserted
    assert len(rows) == 4


def _dir_digest(root):
    """Map of relative parquet-file path -> md5 of its bytes (proves
    byte-identity of untouched partitions, not just row equality)."""
    import hashlib
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
    return out


def test_merge_upsert_partitioned_rewrites_only_touched(spark, tmp_path):
    from mpg_data_warehouse_spark.operators.append import (
        merge_upsert_partitioned,
    )

    table = str(tmp_path / "mp")
    _existing(spark).write.partitionBy("year").parquet(table)
    before = _dir_digest(table)

    updates = spark.createDataFrame(
        [
            Row(survey_ID="b", transect_point="E1", v=42.0, year=2025),  # update
            Row(survey_ID="c", transect_point="E2", v=8.0, year=2025),   # insert
        ]
    )
    merge_upsert_partitioned(
        spark, updates, table, ["survey_ID", "transect_point"], ("year",)
    )
    after = _dir_digest(table)

    # Untouched partition's files: same names AND same bytes.
    b24 = {k: v for k, v in before.items() if k.startswith("year=2024")}
    a24 = {k: v for k, v in after.items() if k.startswith("year=2024")}
    assert b24 == a24 and b24

    rows = {
        (r.survey_ID, r.transect_point): r.v
        for r in spark.read.parquet(table).collect()
    }
    assert rows[("b", "E1")] == 42.0   # matched -> updated
    assert rows[("c", "E2")] == 8.0    # new -> inserted
    assert rows[("a", "N1")] == 1.0    # other partition untouched
    assert len(rows) == 4


def test_merge_upsert_partitioned_rejects_moved_keys(spark, tmp_path):
    import pytest

    from mpg_data_warehouse_spark.operators.append import (
        merge_upsert_partitioned,
    )

    table = str(tmp_path / "mv")
    _existing(spark).write.partitionBy("year").parquet(table)
    # Key (a, N1) lives in year=2024; the update claims year=2025 —
    # a partition-scoped merge would leave the stale 2024 row behind.
    updates = spark.createDataFrame(
        [Row(survey_ID="a", transect_point="N1", v=9.0, year=2025)]
    )
    with pytest.raises(ValueError, match="partition"):
        merge_upsert_partitioned(
            spark, updates, table, ["survey_ID", "transect_point"], ("year",)
        )
    # Nothing was written: table content unchanged.
    assert spark.read.parquet(table).count() == 3


def test_swap_into_place_staged_visibility(spark, tmp_path):
    """truncate_replace leaves a complete table at the path even when
    its input lineage reads the path being replaced; no __old/__tmp
    residue remains."""
    import os

    table = str(tmp_path / "sw")
    _existing(spark).write.parquet(table)
    df = spark.read.parquet(table).filter("year = 2025")
    rows = truncate_replace(spark, df, table)
    assert rows == 1
    assert spark.read.parquet(table).count() == 1
    assert not os.path.exists(table + "__replace_tmp")
    assert not os.path.exists(table + "__old")


def test_overwrite_partitions_touches_only_matching(spark, tmp_path):
    import os

    from mpg_data_warehouse_spark.operators.append import overwrite_partitions

    table = str(tmp_path / "p")
    _existing(spark).write.partitionBy("year").parquet(table)
    before_2024 = set(os.listdir(f"{table}/year=2024"))
    before_2025 = set(os.listdir(f"{table}/year=2025"))

    repl = spark.createDataFrame(
        [Row(survey_ID="only", transect_point="W1", v=5.0, year=2025)]
    )
    overwrite_partitions(spark, repl, table, ("year",))

    after = spark.read.parquet(table)
    assert after.filter("year = 2025").count() == 1      # replaced
    assert after.filter("year = 2024").count() == 2      # untouched
    assert set(os.listdir(f"{table}/year=2024")) == before_2024
    assert set(os.listdir(f"{table}/year=2025")) != before_2025


# --- hash-bucketed MERGE (selective rewrite without a natural partition) ---


def _bucket_files(path):
    import glob
    import os

    return {
        p
        for p in glob.glob(os.path.join(path, "_kb=*", "*.parquet"))
    }


def test_merge_upsert_bucketed_rewrites_only_touched_buckets(spark, tmp_path):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.append import (
        merge_upsert_bucketed,
        read_keybucket_table,
        write_keybucket_table,
    )

    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [Row(k=i, v=f"v{i}") for i in range(200)]
    )
    write_keybucket_table(base, table, ["k"], n_buckets=16)
    before = _bucket_files(table)

    updates = spark.createDataFrame(
        [Row(k=3, v="V3"), Row(k=777, v="V777")]  # one update, one insert
    )
    merge_upsert_bucketed(spark, updates, table)

    got = {r.k: r.v for r in read_keybucket_table(spark, table).collect()}
    assert len(got) == 201
    assert got[3] == "V3" and got[777] == "V777" and got[5] == "v5"

    after = _bucket_files(table)
    # Touched buckets (≤2 of 16) were replaced; every other bucket
    # keeps its exact file set — untouched by the merge.
    import os

    def by_bucket(files):
        d = {}
        for p in files:
            d.setdefault(os.path.basename(os.path.dirname(p)), set()).add(p)
        return d

    b_before, b_after = by_bucket(before), by_bucket(after)
    changed = {
        b
        for b in set(b_before) | set(b_after)
        if b_before.get(b) != b_after.get(b)
    }
    assert 1 <= len(changed) <= 2, changed


def test_merge_upsert_bucketed_validates_keys(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.append import (
        merge_upsert_bucketed,
        write_keybucket_table,
    )

    table = str(tmp_path / "t")
    write_keybucket_table(
        spark.createDataFrame([Row(k=1, j=1, v="a")]), table, ["k"], 4
    )
    with pytest.raises(ValueError, match="bucketing keys"):
        merge_upsert_bucketed(
            spark,
            spark.createDataFrame([Row(k=1, j=2, v="b")]),
            table,
            keys=["j"],
        )


def test_bucketed_merge_prunes_untouched_buckets_in_plan(spark, tmp_path):
    """The existing-side scan must be partition-pruned to the batch's
    buckets — at 100 TB this is the whole point."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.append import (
        BUCKET_COL,
        with_key_bucket,
        write_keybucket_table,
    )
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    base = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(100)])
    write_keybucket_table(base, table, ["k"], n_buckets=8)

    batch = with_key_bucket(
        spark.createDataFrame([Row(k=5, v="x")]), ["k"], 8
    )
    buckets = [r[BUCKET_COL] for r in batch.select(BUCKET_COL).collect()]
    pruned = spark.read.parquet(table).filter(
        F.col(BUCKET_COL).isin(buckets)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # Parquet partition pruning: the scan reports pruned partition count
    assert pruned.count() < 100


def test_lookup_keybucket_prunes_and_finds(spark, tmp_path):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.append import (
        lookup_keybucket,
        write_keybucket_table,
    )

    table = str(tmp_path / "t")
    write_keybucket_table(
        spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(300)]),
        table,
        ["k"],
        n_buckets=32,
    )
    out = lookup_keybucket(spark, table, [7, 123, 9999])
    got = {r.k: r.v for r in out.collect()}
    assert got == {7: "v7", 123: "v123"}      # missing key -> absent
    # partition pruning reaches the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_assign_dense_ids_contract(spark):
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.append import assign_dense_ids

    df = spark.createDataFrame(
        [(f"k{i:04d}", i * 2) for i in range(997)], ["key", "v"]
    )
    out = assign_dense_ids(df, ["key"], id_col="seq", start=100,
                           num_partitions=8)
    rows = sorted((r.key, r.seq) for r in out.collect())
    # dense, starts at 100, ordered by key
    assert [s for _, s in rows] == list(range(100, 100 + 997))
    # deterministic across runs
    out2 = assign_dense_ids(df, ["key"], id_col="seq", start=100,
                            num_partitions=8)
    assert sorted((r.key, r.seq) for r in out2.collect()) == rows
    # original columns intact
    assert set(out.columns) == {"key", "v", "seq"}
