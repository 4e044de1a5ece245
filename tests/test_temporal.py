"""Temporal joins: as-of semantics (latest-prior, ties, no-prior
NULL) and binned range join exactness at bin boundaries."""

from __future__ import annotations

from pyspark.sql import Row

from mpg_data_warehouse_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def test_asof_latest_prior_and_nulls(spark):
    left = spark.createDataFrame(
        [Row(id=1, k="u", t=5), Row(id=2, k="u", t=15), Row(id=3, k="u", t=2),
         Row(id=4, k="v", t=10)]
    )
    right = spark.createDataFrame(
        [Row(k="u", t=3, v=30.0), Row(k="u", t=10, v=100.0),
         Row(k="w", t=1, v=9.0)]
    )
    out = {r.id: r.asof_v for r in asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        right_cols=["v"], prefix="asof_",
    ).collect()}
    assert out[1] == 30.0    # t=5 → right t=3
    assert out[2] == 100.0   # t=15 → right t=10
    assert out[3] is None    # t=2 → no prior right row
    assert out[4] is None    # key v has no right rows at all


def test_asof_tie_takes_simultaneous_right(spark):
    left = spark.createDataFrame([Row(id=1, k="u", t=10)])
    right = spark.createDataFrame([Row(k="u", t=10, v=7.0)])
    out = asof_join(left, right, "k", "t", "t", ["v"]).collect()[0]
    assert out.asof_v == 7.0  # l.ts >= r.ts includes equality


def test_asof_preserves_left_cardinality(spark):
    left = spark.createDataFrame([Row(id=i, k="u", t=i) for i in range(20)])
    right = spark.createDataFrame([Row(k="u", t=5, v=1.0), Row(k="u", t=9, v=2.0)])
    out = asof_join(left, right, "k", "t", "t", ["v"])
    assert out.count() == 20  # never fans out, never drops


def test_range_join_binned_matches_naive(spark):
    pts = spark.createDataFrame([Row(pid=i, x=i) for i in range(0, 50)])
    ivs = spark.createDataFrame(
        [Row(iid=1, lo=3, hi=9), Row(iid=2, lo=9, hi=9),
         Row(iid=3, lo=20, hi=41), Row(iid=4, lo=60, hi=70)]
    )
    binned = range_join_binned(pts, ivs, "x", "lo", "hi", bin_width=7)
    naive = pts.crossJoin(ivs).filter("x >= lo AND x <= hi")
    got = sorted((r.pid, r.iid) for r in binned.collect())
    want = sorted((r.pid, r.iid) for r in naive.collect())
    assert got == want
    assert got  # non-empty (intervals 1-3 contain points)
    # boundary membership: hi inclusive, single-point interval works
    assert (9, 1) in got and (9, 2) in got


def test_funnel_conversion_semantics(spark):
    import datetime as dt

    from mpg_data_warehouse_spark.operators.temporal import funnel_conversion

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        # u1: click @0, purchase @30 → converted
        (1, ts(0), "click"), (1, ts(30), "purchase"),
        # u2: purchase BEFORE first click, next purchase @90 → not converted
        (2, ts(-10), "purchase"), (2, ts(0), "click"), (2, ts(90), "purchase"),
        # u3: click only → b null, not converted
        (3, ts(5), "click"),
        # u4: purchase only (no click) → absent from output
        (4, ts(1), "purchase"),
        # u5: two clicks, purchase within window of FIRST click only
        (5, ts(0), "click"), (5, ts(55), "click"), (5, ts(50), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r.user: (r.converted, r.b_ts is not None)
        for r in funnel_conversion(
            ev, "user_id", "ts", "event_type", "click", "purchase", 3600
        ).collect()
    }
    assert out[1] == (True, True)
    assert out[2] == (False, True)   # 90 min > 1h window
    assert out[3] == (False, False)
    assert 4 not in out
    assert out[5] == (True, True)    # first-click anchor


def test_asof_latest_row_wins_even_with_null_fields(spark):
    """The LATEST right row's values win as a ROW — a NULL field in it
    must come back NULL, not back-filled from an older right row (the
    DuckDB ASOF JOIN parity target); and a right row with a NULL
    timestamp matches nothing instead of poisoning the key."""
    left = spark.createDataFrame([Row(k=1, t=10)])
    right = spark.createDataFrame(
        [
            Row(k=1, t=1, v="old"),
            Row(k=1, t=5, v=None),
        ]
    )
    out = asof_join(left, right, "k", "t", "t", ["v"]).collect()[0]
    assert out.asof_v is None, "stale value resurrected from an older row"

    ghost = spark.createDataFrame(
        [Row(k=1, t=None, v="ghost")], "k bigint, t bigint, v string"
    )
    out2 = asof_join(left, ghost, "k", "t", "t", ["v"]).collect()[0]
    assert out2.asof_v is None, "null-ts right row matched"


def test_range_join_left_null_extends_unmatched_points(spark):
    """how='left' keeps points with no containing interval as
    null-extended rows (the old post-join predicate filter silently
    degraded left to inner); unsupported hows raise."""
    import pytest as _pytest

    from mpg_data_warehouse_spark.operators.temporal import (
        range_join_binned,
    )

    points = spark.createDataFrame(
        [Row(pid=1, x=100), Row(pid=2, x=999), Row(pid=2, x=999)]
    )
    intervals = spark.createDataFrame([Row(iid=7, lo=90, hi=110)])
    got = range_join_binned(
        points, intervals, "x", "lo", "hi", bin_width=50, how="left"
    ).collect()
    by_pid = {}
    for r in got:
        by_pid.setdefault(r.pid, []).append(r.iid)
    assert by_pid[1] == [7]
    # both copies of the unmatched point survive, null-extended
    assert by_pid[2] == [None, None]
    with _pytest.raises(ValueError, match="how"):
        range_join_binned(
            points, intervals, "x", "lo", "hi", 50, how="full"
        )
