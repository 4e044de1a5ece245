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
