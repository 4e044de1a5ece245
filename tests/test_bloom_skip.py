"""Per-file Bloom skipping (sources/bloom_skip.py): point lookups
must stay EXACT under any pruning decision (false negatives
impossible), and the skipping must be real — files the bloom rules
out never enter the scan plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.sources import txlog
from mpg_data_warehouse_spark.sources.bloom_skip import (
    build_file_blooms,
    read_bloom_pruned,
)


def _mk(spark, ids, seg="a"):
    return spark.createDataFrame(
        [Row(cust_id=i, segment=seg, balance=float(i)) for i in ids]
    )


@pytest.fixture()
def table(spark, tmp_path):
    """Four single-file commits with disjoint cust_id ranges."""
    t = str(tmp_path / "t")
    txlog.create(spark, t, _mk(spark, range(0, 1000)).coalesce(1))
    for lo in (1000, 2000, 3000):
        txlog.append(spark, t, _mk(spark, range(lo, lo + 1000)).coalesce(1))
    build_file_blooms(spark, t, "cust_id")
    return t


def test_point_lookup_exact_and_pruned(spark, table):
    df = read_bloom_pruned(spark, table, "cust_id", 2500)
    assert [r["cust_id"] for r in df.collect()] == [2500]
    # the skipping is real: of 4 live files only the value's own file
    # (± bloom false positives, ~1% per file) enters the plan
    assert len(df.inputFiles()) <= 2
    assert len(txlog.read(spark, table).inputFiles()) == 4


def test_absent_value_returns_empty(spark, table):
    assert read_bloom_pruned(spark, table, "cust_id", 999_999).count() == 0


def test_uncovered_new_file_never_pruned(spark, table):
    """Files appended after the last refresh have no bloom yet — they
    must ALWAYS be kept (no false negatives, ever)."""
    txlog.append(spark, table, _mk(spark, [777_777]).coalesce(1))
    assert read_bloom_pruned(spark, table, "cust_id", 777_777).count() == 1
    # incremental refresh covers it; lookup still exact and pruned
    build_file_blooms(spark, table, "cust_id")
    df = read_bloom_pruned(spark, table, "cust_id", 777_777)
    assert df.count() == 1
    assert len(df.inputFiles()) <= 2


def test_refresh_noop_returns_stamp(spark, table):
    v = build_file_blooms(spark, table, "cust_id")
    assert build_file_blooms(spark, table, "cust_id") == v


def test_delete_then_refresh_drops_dead_rows(spark, table):
    txlog.delete(spark, table, "cust_id >= 3000")
    build_file_blooms(spark, table, "cust_id")
    assert read_bloom_pruned(spark, table, "cust_id", 3500).count() == 0
    assert read_bloom_pruned(spark, table, "cust_id", 1500).count() == 1


def test_agreement_with_full_scan(spark, table):
    live = txlog.read(spark, table)
    for probe in (0, 999, 1000, 2999, 3999, 123_456):
        got = read_bloom_pruned(spark, table, "cust_id", probe).count()
        want = live.where(F.col("cust_id") == probe).count()
        assert got == want, probe


def test_param_change_forces_rebuild(spark, table):
    """A refresh under different (n_bits, k, seed) must not mix draws
    from two parameter sets — it rebuilds, and lookups stay exact."""
    build_file_blooms(spark, table, "cust_id", n_bits=1 << 16, k=5)
    assert read_bloom_pruned(spark, table, "cust_id", 1500).count() == 1
    assert read_bloom_pruned(spark, table, "cust_id", 999_999).count() == 0


def test_missing_sidecar_raises(spark, tmp_path):
    t = str(tmp_path / "t2")
    txlog.create(spark, t, _mk(spark, range(5)))
    with pytest.raises(FileNotFoundError, match="bloom sidecar"):
        read_bloom_pruned(spark, t, "cust_id", 1)


def test_bad_params_rejected(spark, tmp_path):
    t = str(tmp_path / "t3")
    txlog.create(spark, t, _mk(spark, range(5)))
    with pytest.raises(ValueError, match="multiple of 64"):
        build_file_blooms(spark, t, "cust_id", n_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        build_file_blooms(spark, t, "cust_id", k=0)


def test_in_list_probe_exact_and_pruned(spark, table):
    """Batched IN-list lookup: one sidecar pass for all values; files
    proven absent of EVERY probed value are skipped, results exact."""
    df = read_bloom_pruned(
        spark, table, "cust_id", values=[500, 2500, 999_999]
    )
    assert {r["cust_id"] for r in df.collect()} == {500, 2500}
    # values live in 2 of 4 files (± FPR)
    assert len(df.inputFiles()) <= 3
    want = (
        txlog.read(spark, table)
        .where(F.col("cust_id").isin(500, 2500, 999_999))
        .count()
    )
    assert df.count() == want


def test_probe_arg_validation(spark, table):
    with pytest.raises(ValueError, match="exactly one"):
        read_bloom_pruned(spark, table, "cust_id")
    with pytest.raises(ValueError, match="exactly one"):
        read_bloom_pruned(spark, table, "cust_id", 1, values=[2])
    with pytest.raises(ValueError, match="empty"):
        read_bloom_pruned(spark, table, "cust_id", values=[])


def test_typed_column_probe_no_false_negative(spark, table):
    """r8 ADVICE medium: the build hashes the column under the TABLE's
    type; a probe of a different Python type (int against a double
    column) must be cast to the column type before hashing, or it
    renders '2500' vs the build's '2500.0' and silently prunes the
    matching file."""
    build_file_blooms(spark, table, "balance")
    got = read_bloom_pruned(spark, table, "balance", 2500)
    assert [r["cust_id"] for r in got.collect()] == [2500]
    assert len(got.inputFiles()) <= 2  # and the pruning still works
    # IN-list form, mixed int/float probes against the double column
    got = read_bloom_pruned(spark, table, "balance", values=[500, 2500.0])
    assert {r["cust_id"] for r in got.collect()} == {500, 2500}


def test_uncastable_probe_raises(spark, table):
    build_file_blooms(spark, table, "balance")
    with pytest.raises(TypeError, match="cannot be cast"):
        read_bloom_pruned(spark, table, "balance", "not-a-number")


def test_table_path_with_space(spark, tmp_path):
    """r8 ADVICE medium: input_file_name() is percent-encoded — a
    space in the table path arrives as %20 and the table-root strip
    must still key sidecar rows by commit-relative path (a raw-URI
    key fails every maybe-set lookup and the query returns empty)."""
    t = str(tmp_path / "dir with space" / "t")
    txlog.create(spark, t, _mk(spark, range(0, 100)).coalesce(1))
    txlog.append(spark, t, _mk(spark, range(100, 200)).coalesce(1))
    build_file_blooms(spark, t, "cust_id")
    got = read_bloom_pruned(spark, t, "cust_id", 150)
    assert [r["cust_id"] for r in got.collect()] == [150]
    assert len(got.inputFiles()) <= 1  # sidecar keys matched → pruned


def test_partition_value_with_space(spark, tmp_path):
    """Hive partition VALUES are percent-encoded in the URI too."""
    t = str(tmp_path / "tp")
    df = spark.createDataFrame(
        [Row(cust_id=i, segment=("big spender" if i % 2 else "basic"))
         for i in range(100)]
    )
    txlog.create(spark, t, df, partition_by=["segment"])
    build_file_blooms(spark, t, "cust_id")
    got = read_bloom_pruned(spark, t, "cust_id", 51)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["segment"] == "big spender"


def test_build_on_empty_table(spark, tmp_path):
    """r8 ADVICE low: first build over an empty table must install an
    empty sidecar (not TypeError on prev=None), and a refresh after
    every covered file was removed must not IndexError."""
    t = str(tmp_path / "te")
    empty = spark.createDataFrame(
        [], "cust_id bigint, segment string, balance double"
    )
    txlog.create(spark, t, empty)
    v = build_file_blooms(spark, t, "cust_id")
    assert read_bloom_pruned(spark, t, "cust_id", 1).count() == 0
    # append after the empty bootstrap: uncovered file always kept
    txlog.append(spark, t, _mk(spark, [42]).coalesce(1))
    assert read_bloom_pruned(spark, t, "cust_id", 42).count() == 1
    v2 = build_file_blooms(spark, t, "cust_id")
    assert v2 > v
    assert read_bloom_pruned(spark, t, "cust_id", 42).count() == 1
    # remove EVERY live file, refresh → empty sidecar again, no crash
    txlog.delete(spark, t, "cust_id >= 0")
    build_file_blooms(spark, t, "cust_id")
    assert read_bloom_pruned(spark, t, "cust_id", 42).count() == 0


def test_refresh_all_blooms_discovers_every_sidecar(spark, table):
    from mpg_data_warehouse_spark.sources.bloom_skip import (
        bloom_sidecar_columns,
        refresh_all_blooms,
    )

    build_file_blooms(spark, table, "balance", n_bits=1 << 16, k=5)
    assert bloom_sidecar_columns(table) == ["balance", "cust_id"]
    txlog.append(spark, table, _mk(spark, [50_000]).coalesce(1))
    out = refresh_all_blooms(spark, table)
    assert set(out) == {"balance", "cust_id"}
    # refreshed under each sidecar's OWN recorded params: both probe
    # exactly after the refresh
    got = read_bloom_pruned(spark, table, "cust_id", 50_000)
    assert got.count() == 1 and len(got.inputFiles()) <= 2
    assert read_bloom_pruned(spark, table, "balance", 50_000.0).count() == 1


def test_maintain_table_compact_then_bloom_refresh(spark, table):
    """OPTIMIZE + index upkeep as one call: compaction rewrites every
    live file (all uncovered), maintain_table re-covers them — probes
    prune again instead of silently full-scanning."""
    from mpg_data_warehouse_spark.sources.maintenance import maintain_table

    out = maintain_table(
        spark, table, target_partitions=4, cluster_by=["cust_id"]
    )
    assert out["blooms"]["cust_id"] == out["compacted_version"]
    got = read_bloom_pruned(spark, table, "cust_id", 2500)
    assert [r["cust_id"] for r in got.collect()] == [2500]
    # post-compaction the table is 4 clustered files; the probe must
    # scan fewer than all of them
    all_files = txlog.read(spark, table).inputFiles()
    assert len(all_files) == 4
    assert len(got.inputFiles()) < len(all_files)


def test_large_in_batch_uses_semi_join_residual(spark, table):
    """CDC-replay-sized batches (> 64 values): the residual switches
    from an IN expression (whole-stage-codegen blowup at that length —
    the same rule the build path applies to its kept-file list) to a
    broadcast semi-join against the typed probe frame. Answers match
    the plain filter exactly, including misses and a None probe."""
    vals = list(range(400, 600)) + [999_999, None]
    df = read_bloom_pruned(spark, table, "cust_id", values=vals)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "large batch should semi-join, not isin"
    want = {
        r["cust_id"]
        for r in txlog.read(spark, table)
        .where(F.col("cust_id").isin([v for v in vals if v is not None]))
        .collect()
    }
    assert {r["cust_id"] for r in df.collect()} == want == set(range(400, 600))
