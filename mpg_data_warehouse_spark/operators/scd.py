"""Slowly-changing-dimension (type 2) maintenance: history-preserving
dimension updates.

The reference repairs dimensions in place (UPDATE-from-join /
truncate-replace — SURVEY.md §2.3 J4/J5, §2.1 S12, e.g.
src/fix_gridveg_dates.py:85-133), losing history. SCD2 is the
warehouse-native extension: closing the old version of a changed row
and appending the new one, each with an effective-date interval, so
every historical query can join "the dimension as of then"
(``asof_join`` in operators/temporal.py is the read-side complement).

Scale notes: one keyed join of the *current slice* of the dimension
against the (small) change batch, plus a pass-through union of the
history slice — history is never reshuffled. Recompute-and-overwrite of
the dimension table matches the engine's mutation policy
(operators/append.py::truncate_replace); a Delta/Iceberg deployment
would express the same thing as MERGE without changing this
function's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "scd2_init"]

OPEN_END = "9999-12-31"


def scd2_init(
    snapshot: DataFrame, effective_from: str, date_col: str = "effective_from"
) -> DataFrame:
    """Bootstrap an SCD2 dimension from a plain snapshot: every row
    current, effective from the given date, open-ended."""
    return snapshot.select(
        "*",
        F.lit(effective_from).cast("date").alias(date_col),
        F.lit(OPEN_END).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension as of
    ``effective_date`` (ISO string).

    * rows whose tracked ``attrs`` differ from the current version →
      current version closed (``effective_to`` = effective_date,
      ``is_current`` = false) + new open version appended;
    * unchanged / untouched keys pass through;
    * keys new to the dimension → inserted as open versions.

    Change detection is null-safe (``eqNullSafe``) per attribute.
    The change batch may contain brand-new keys, so the matching join
    is FULL OUTER — one sort-merge shuffle on the key (full outer
    cannot broadcast); with a guaranteed insert-free batch a caller
    could downgrade to a broadcast left join. History rows
    (``is_current`` = false) are never rewritten or reshuffled.
    """
    eff = F.lit(effective_date).cast("date")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    # the batch must be a FUNCTION of the key (the txlog merge()
    # rule): duplicate keys fan the full-outer join out — the current
    # row closes TWICE and several simultaneous open versions land,
    # breaking the one-current-row-per-key invariant for every later
    # read; null keys never match, so each apply would re-insert them
    # forever. One aggregate, raised loudly.
    chk = (
        changes.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.max("_c").alias("_max"),
            F.max(F.col(key).isNull().cast("int")).alias("_null"),
        )
        .first()
    )
    if chk is not None and chk["_max"] is not None:
        if chk["_max"] > 1:
            raise ValueError(
                f"change batch has up to {chk['_max']} rows per "
                f"{key!r} — SCD2 apply would open multiple current "
                "versions; dedupe with an explicit rule first"
            )
        if chk["_null"]:
            raise ValueError(
                f"change batch contains NULL {key!r} values — null "
                "keys never match and would re-insert on every apply"
            )

    ch = changes.select(
        F.col(key),
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
    )
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(a).eqNullSafe(F.col(f"_new_{a}"))
    # a key is "in the change batch" iff the join found a change row;
    # detected via a marker that survives the outer join regardless of
    # attr nullability:
    marked = current.join(
        ch.withColumn("_in_batch", F.lit(True)), key, "full_outer"
    )

    is_existing = F.col("effective_from").isNotNull()
    is_changed = F.col("_in_batch") & is_existing & ~same
    is_new_key = F.col("_in_batch") & ~is_existing

    closed = marked.filter(is_changed).select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("effective_from"),
        eff.alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    reopened = marked.filter(is_changed | is_new_key).select(
        F.col(key),
        *[F.col(f"_new_{a}").alias(a) for a in attrs],
        eff.alias("effective_from"),
        F.lit(OPEN_END).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    untouched = marked.filter(is_existing & (F.col("_in_batch").isNull() | same)).select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("effective_from"),
        F.col("effective_to"),
        F.col("is_current"),
    )
    cols = [key, *attrs, "effective_from", "effective_to", "is_current"]
    return (
        history.select(*cols)
        .unionByName(untouched)
        .unionByName(closed)
        .unionByName(reopened)
    )
