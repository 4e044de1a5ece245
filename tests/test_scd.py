"""SCD2 dimension maintenance: close/open semantics, null-safe change
detection, history immutability, idempotence of a no-op batch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.scd import OPEN_END, scd2_apply, scd2_init


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, None, 30.0)],
        ["k", "seg", "bal"],
    )
    return scd2_init(snap, "2020-01-01")


def test_changed_row_closed_and_reopened(spark):
    changes = spark.createDataFrame([(1, "Z", 10.0)], ["k", "seg", "bal"])
    out = scd2_apply(_dim(spark), changes, "k", ["seg", "bal"], "2021-06-01")
    rows = sorted(out.filter("k = 1").collect(), key=lambda r: str(r.effective_from))
    assert len(rows) == 2
    closed, opened = rows
    assert not closed.is_current and str(closed.effective_to) == "2021-06-01"
    assert closed.seg == "A"  # old attrs preserved on the closed row
    assert opened.is_current and opened.seg == "Z"
    assert str(opened.effective_from) == "2021-06-01"
    assert str(opened.effective_to) == OPEN_END


def test_unchanged_and_untouched_pass_through(spark):
    # k=2 is in the batch but identical → must NOT be versioned
    changes = spark.createDataFrame([(2, "B", 20.0)], ["k", "seg", "bal"])
    out = scd2_apply(_dim(spark), changes, "k", ["seg", "bal"], "2021-06-01")
    assert out.count() == 3
    assert out.filter("is_current").count() == 3
    assert out.filter("k = 2").first().effective_from == datetime.date(2020, 1, 1)


def test_null_safe_change_detection(spark):
    # seg NULL → NULL is "same"; NULL → 'X' is a change
    same = spark.createDataFrame(
        [(3, None, 30.0)], schema="k long, seg string, bal double"
    )
    out = scd2_apply(_dim(spark), same, "k", ["seg", "bal"], "2021-06-01")
    assert out.filter("k = 3").count() == 1  # no new version
    changed = spark.createDataFrame([(3, "X", 30.0)], ["k", "seg", "bal"])
    out2 = scd2_apply(_dim(spark), changed, "k", ["seg", "bal"], "2021-06-01")
    assert out2.filter("k = 3").count() == 2


def test_new_key_inserted_open(spark):
    changes = spark.createDataFrame([(9, "N", 1.0)], ["k", "seg", "bal"])
    out = scd2_apply(_dim(spark), changes, "k", ["seg", "bal"], "2021-06-01")
    row = out.filter("k = 9").first()
    assert row.is_current and str(row.effective_from) == "2021-06-01"
    assert out.count() == 4


def test_history_rows_never_rewritten(spark):
    """Apply twice: the round-2 batch must not touch round-1 history."""
    dim = _dim(spark)
    c1 = spark.createDataFrame([(1, "Z", 10.0)], ["k", "seg", "bal"])
    v2 = scd2_apply(dim, c1, "k", ["seg", "bal"], "2021-01-01")
    c2 = spark.createDataFrame([(1, "W", 10.0)], ["k", "seg", "bal"])
    v3 = scd2_apply(v2, c2, "k", ["seg", "bal"], "2022-01-01")
    k1 = sorted(v3.filter("k = 1").collect(), key=lambda r: str(r.effective_from))
    assert [(r.seg, str(r.effective_to), r.is_current) for r in k1] == [
        ("A", "2021-01-01", False),
        ("Z", "2022-01-01", False),
        ("W", OPEN_END, True),
    ]


def test_asof_read_side(spark):
    """The point of SCD2: an interval predicate reconstructs the
    dimension as of any date."""
    dim = _dim(spark)
    c1 = spark.createDataFrame([(1, "Z", 10.0)], ["k", "seg", "bal"])
    v2 = scd2_apply(dim, c1, "k", ["seg", "bal"], "2021-01-01")
    asof = "2020-07-01"
    snap = v2.filter(
        (F.col("effective_from") <= F.lit(asof))
        & (F.col("effective_to") > F.lit(asof))
    )
    assert {(r.k, r.seg) for r in snap.collect()} == {(1, "A"), (2, "B"), (3, None)}


def test_scd2_apply_rejects_duplicate_and_null_batch_keys(spark):
    """A change batch with duplicate keys would open multiple current
    versions (the full-outer join fans out); null keys would
    re-insert forever — both raise loudly (the txlog merge() rule)."""
    import pytest as _pytest
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.scd import scd2_apply, scd2_init

    dim = scd2_init(
        spark.createDataFrame([Row(k=1, v="v0")]), "2024-01-01"
    )
    dup = spark.createDataFrame([Row(k=1, v="v1"), Row(k=1, v="v2")])
    with _pytest.raises(ValueError, match="rows per"):
        scd2_apply(dim, dup, "k", ["v"], "2024-02-01")
    nullk = spark.createDataFrame(
        [Row(k=None, v="x")], "k bigint, v string"
    )
    with _pytest.raises(ValueError, match="NULL"):
        scd2_apply(dim, nullk, "k", ["v"], "2024-02-01")
