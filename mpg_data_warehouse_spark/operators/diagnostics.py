"""Skew and cardinality diagnostics — the pre-flight checks a 100 TB
join or aggregation needs BEFORE it runs.

Shuffle skew is the dominant large-cluster failure mode: one hot key
puts one reducer hours behind the other 999 executors. These
diagnostics quantify the key distribution cheaply (one pass, partial
aggregation, driver receives only top-N rows / a handful of scalars)
so the caller can pick the right physical strategy — broadcast,
``joins.salted_join`` with an informed salt count, or AQE skew-join —
instead of guessing. The reference never needed this (BigQuery hides
its shuffle); a Spark engine at scale must surface it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_report", "suggest_salts"]


def key_skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 20
) -> DataFrame:
    """The ``top_n`` heaviest key groups with their share of all rows
    and the skew ratio vs a perfectly uniform key.

    Output: key columns + ``n_rows`` (group size), ``row_share``
    (fraction of the table), ``skew_ratio`` (group size ÷ mean group
    size — >10 means the key needs salting or AQE skew handling).

    One hash-agg keyed on the join key (partial aggregation collapses
    within-partition repeats — the shuffle carries distinct keys), a
    tiny two-scalar aggregate of that result joined back as a
    broadcast, and a distributed TakeOrderedAndProject head. The
    driver receives ``top_n`` rows, never the key distribution.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("row_share"),
            F.round(
                F.col("n_rows") / (F.col("_total") / F.col("_n_keys")), 2
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_n)
    )


def suggest_salts(
    df: DataFrame,
    key_cols: list[str],
    target_rows_per_task: int = 1_000_000,
) -> int:
    """Salt count for ``joins.salted_join`` from the measured hottest
    key: enough salts that the hottest key's rows split into chunks of
    ~``target_rows_per_task``, clamped to [1, 1024]. Returns 1 when no
    key exceeds the target (salting would only add overhead).

    Cost: the same single-pass key count as ``key_skew_report``
    reduced to ONE scalar (max group size) — run it once on a sample
    or the previous day's partition; the answer is stable as long as
    the key distribution is.
    """
    hottest = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    if hottest is None or hottest <= target_rows_per_task:
        return 1
    return min(1024, -(-int(hottest) // target_rows_per_task))
