"""Join strategy helpers for 100 TB operation: skew salting and
bucketed co-location.

The reference never needed these (≤300 K rows; BigQuery decided join
strategy opaquely) — they are the engine-level policies that keep the
same semantics viable at warehouse scale:

* ``salted_join`` — when one join key carries a disproportionate share
  of rows (a hot survey, a hot user_id), a plain shuffle join lands
  the whole hot key in one task. Salting splits the big side's hot
  keys across ``n_salts`` shuffle partitions and replicates the small
  side once per salt. NOTE: this is the FALLBACK, not the default —
  the engine session enables ``spark.sql.adaptive.skewJoin`` and AQE
  splits skewed sort-merge partitions at runtime with no code change
  (proven by ``test_plans.py::
  test_aqe_skew_join_splits_on_session_config``). Reach for explicit
  salting only for the pathological tail AQE can't fix: skew on the
  BUILD side of a non-splittable join type, or a single key too hot
  for advisory-size splitting.
* ``write_bucketed`` / shuffle-free bucketed joins — facts repeatedly
  joined on the same key are written bucketed by it; Spark then
  sort-merge-joins bucket-to-bucket with NO exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Join types ``salted_join`` supports (normalized: lowercase, no
#: underscores). Right/full-outer are structurally incompatible with
#: small-side replication: each UNMATCHED small row would surface once
#: per salt replica, so those types raise instead of returning
#: silently duplicated rows.
_SALTED_JOIN_HOWS = frozenset(
    {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
)


def salt_expr(
    on: list[str], n_salts: int, salt_cols: list[str] | None = None
) -> Column:
    """The deterministic salt column ``salted_join`` stamps on the big
    side — exposed so tests can pin its SPREAD property (not just the
    join's result identity, which stays green even if the salt
    degenerates to a constant). See ``salted_join`` for the
    determinism rationale and the ``salt_cols`` caveat."""
    if salt_cols:
        salt_src = [F.col(c) for c in salt_cols]
    else:
        salt_src = [F.col(c) for c in on] + [F.spark_partition_id()]
    return F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic
    salt, the small side is replicated ``n_salts``× via explode, and
    the join key becomes (key, salt). For the SUPPORTED join types —
    inner / left / semi / anti (``how`` is validated) — the result
    equals ``big.join(small, on, how)`` row for row; only the physical
    distribution changes. Right and full-outer joins are rejected:
    replicating the small side would emit each unmatched small row
    once per salt, so the equivalence does not hold there and the
    function raises rather than silently duplicating.

    The salt must be DETERMINISTIC per row (no rand()/
    monotonically_increasing_id(): a nondeterministic repartition key
    can duplicate or drop rows when a reducer refetches from a re-run
    map task — the SPARK-23207 class of bug). Two deterministic
    sources, chosen by ``salt_cols``:

    * default (``salt_cols=None``): hash of the join keys mixed with
      ``spark_partition_id()``. Reads NOTHING beyond the keys — an
      earlier whole-row hash defeated column pruning (the scan read
      every column just to compute the salt; caught by the
      plan-pinned ``test_scans_prune_columns``). Spreads a hot key
      across however many input partitions it occupies — right for
      scan-fed inputs (file splits don't cluster by key). CAVEAT: if
      the big side arrives partitioned BY the join key (e.g. straight
      out of a groupBy on it), the hot key occupies ONE partition,
      pid is constant for it, and this salt provides no spread —
      pass ``salt_cols`` there.
    * ``salt_cols=[...]``: hash of named row columns — per-row spread
      independent of the input partitioning, retry-safe because it is
      row CONTENT. Pick high-cardinality columns the plan already
      reads (an id column), so pruning is unaffected."""
    if how.replace("_", "").lower() not in _SALTED_JOIN_HOWS:
        raise ValueError(
            f"salted_join does not support how={how!r}: small-side "
            "replication duplicates unmatched small rows under "
            "right/full-outer semantics (supported: inner, left, "
            "semi, anti)"
        )
    b = big.withColumn("_salt", salt_expr(on, n_salts, salt_cols))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join
    key. Subsequent equi-joins between tables bucketed the same way
    run with zero Exchange — the shuffle was paid once at write time,
    amortized over every later join (the batch analog of co-located
    storage)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> bool:
    """Plan introspection: True iff joining the two saved tables on
    their bucket key produces no Exchange on either input (the
    co-location proof — used by tests and ops checks)."""
    plan = (
        spark.table(left)
        .join(spark.table(right), on)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return "Exchange" not in plan
