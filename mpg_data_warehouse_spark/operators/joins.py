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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic
    salt (hash of the join keys mixed with ``spark_partition_id()`` —
    no rand(), which breaks task re-execution), the small side is
    replicated ``n_salts``× via explode, and the join key becomes
    (key, salt). Result equals ``big.join(small, on, how)`` row for
    row; only the physical distribution changes.

    The salt deliberately reads NOTHING beyond the join keys: an
    earlier whole-row hash defeated column pruning — the scan read
    every column of the big side just to compute the salt (caught by
    the plan-pinned ``test_scans_prune_columns``). Mixing in the
    input partition id spreads a hot key across however many
    partitions it occupies (a key confined to ONE input partition is
    already bounded by partition size and needs no spread); it is
    stable across task retries because Spark re-executes a partition
    deterministically under the same lineage."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.spark_partition_id()),
        F.lit(n_salts),
    )
    b = big.withColumn("_salt", salt)
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
