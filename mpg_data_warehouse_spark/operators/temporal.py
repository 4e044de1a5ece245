"""Temporal join operators Spark lacks natively: as-of join and
binned range join.

Neither appears in the reference (SURVEY §2.3: "No theta/range/as-of
joins") — these are the §7 extension operators a timestamped event
surface needs, built as compositions of existing DataFrame ops per
the engine's custom-operator policy (composition first, Pandas UDF
only if semantics demand).

* ``asof_join`` — for every left row, the latest right row with
  ``right_ts <= left_ts`` per key. Spark has no ASOF JOIN; the naive
  encoding (non-equi join + per-left-row max) is a cross-product-per-
  key. This implementation is the union-sort trick: tag both sides,
  union, and carry right-side values forward with a
  ``last(ignorenulls)`` running window — ONE shuffle+sort on
  (key, ts), linear state, no cross product at any scale.
* ``range_join_binned`` — point-in-interval joins compile to
  BroadcastNestedLoopJoin in Spark (quadratic work per partition).
  Binning rewrites them as an equi-join on the bin id: intervals
  explode to the bins they overlap, points map to one bin, the join
  is hash-partitioned, and the exact predicate filters within bins.
  Bin width trades replication factor vs selectivity — set it near
  the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row gains ``prefix + c`` for each
    ``c`` in ``right_cols``, holding the value from the latest right
    row with ``right_ts <= left_ts`` and matching ``key`` (NULL when
    no prior right row exists). Ties at equal timestamps resolve to
    the right row (matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).
    """
    from pyspark.sql import types as T

    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # The right VALUES travel as ONE struct, not per-column fills: a
    # per-column last(ignorenulls) back-filled a NULL field in the
    # latest right row from an OLDER right row — resurrecting a
    # superseded value DuckDB's ASOF JOIN (the parity target) returns
    # as NULL. The struct is non-null for every right row (even with
    # all-null fields), so one last(ignorenulls) carries the whole
    # latest row or nothing.
    row_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    rt = (
        # a NULL right timestamp satisfies no `right_ts <= left_ts` —
        # unfiltered it sorts FIRST ascending and its values would be
        # carried into every left row of the key (one dirty row
        # poisoning the key's whole history)
        right.filter(F.col(right_ts).isNotNull())
        .select(
            key,
            F.col(right_ts).alias("_ts"),
            F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
        )
        .withColumn("_side", F.lit(0))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    lt = lt.withColumn("_rrow", F.lit(None).cast(row_type))
    unioned = lt.unionByName(rt.select(*lt.columns))
    # Right rows sort before left rows at equal _ts (side 0 < 1), so a
    # left row at exactly t sees a right row at t.
    w = (
        W.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "_rrow", F.last(F.col("_rrow"), ignorenulls=True).over(w)
    )
    for c in right_cols:
        filled = filled.withColumn(f"{prefix}{c}", F.col(f"_rrow.{c}"))
    return filled.filter(F.col("_side") == 1).drop("_side", "_ts", "_rrow")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``lo <= point <= hi``) as a binned
    equi-join. ``point_col``/``lo_col``/``hi_col`` must be numeric in
    the same units (cast dates to epoch days first). Output: every
    (point row × containing interval row) pair, exact.

    ``how``: ``inner`` or ``left``. LEFT puts the exact range
    predicate INSIDE the outer join's condition (alongside the bin
    equality): null-extension then applies exactly to points no
    interval satisfies — one pass, duplicate point rows keep their
    multiplicity, and no post-join filter can reject the
    null-extended rows (the r10 bug this replaced was the predicate
    as a filter AFTER the outer join, which silently degraded left to
    inner; the r10 fix — inner-matches ∪ null-safe-anti-joined
    unmatched points — was correct but enumerated the pair set THREE
    times in one plan plus a pair-wide distinct, which dominated the
    slot at 10× scale)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} not supported — 'inner' or 'left' (right/full"
            " have no binned formulation here)"
        )
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    rng = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    if how == "inner":
        return p.join(i, "_bin", "inner").filter(rng).drop("_bin")
    # LEFT: each point has exactly ONE bin, so an interval can match a
    # point only in that bin — the (bin-equality AND range) join
    # condition yields each (point, interval) pair at most once and
    # one null-extended row per point with no qualifying interval.
    cond = (
        (p["_bin"] == i["_bin"])
        & (p[point_col] >= i[lo_col])
        & (p[point_col] <= i[hi_col])
    )
    return p.join(i, cond, "left").drop("_bin")


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    step_a: str,
    step_b: str,
    max_delay_seconds: int,
) -> DataFrame:
    """Ordered two-step funnel per user: the FIRST ``step_a`` event,
    the first ``step_b`` at or after it, and whether the pair
    converts within ``max_delay_seconds``.

    Output: (user, a_ts, b_ts nullable, converted bool) — one row per
    user who performed step A at all.

    Plan shape: filter to the two step types (pushed to the scan),
    one groupBy(user) with conditional min aggregates — min(ts | A)
    and min(ts | B ∧ ts ≥ first-A) need first-A before B can be
    bounded, so it runs as two cheap aggregates over the pre-filtered
    slice: first-A per user, broadcast-joined back, then min-B.
    Both shuffles are on the user key over the two-type slice only —
    at 100 TB of events the funnel cost is proportional to the two
    step types' volume, not the event stream.
    """
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(step_a, step_b))
    first_a = (
        ev.filter(F.col("etype") == step_a)
        .groupBy("user")
        .agg(F.min("ts").alias("a_ts"))
    )
    b_after = (
        ev.filter(F.col("etype") == step_b)
        .join(first_a, "user")
        .filter(F.col("ts") >= F.col("a_ts"))
        .groupBy("user")
        .agg(F.min("ts").alias("b_ts"))
    )
    return (
        first_a.join(b_after, "user", "left")
        .withColumn(
            "converted",
            F.col("b_ts").isNotNull()
            & (
                F.col("b_ts").cast("long") - F.col("a_ts").cast("long")
                <= F.lit(max_delay_seconds)
            ),
        )
    )
