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


def approx_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    rsd: float = 0.05,
) -> DataFrame:
    """Sketch-based column profiling for tables too big to profile
    exactly: one row per column with ``(column, n, n_null,
    approx_distinct, min, max, p50/p95/p99)``.

    The 100 TB form of the reference's univariate profiling habit
    (A9 — src/analyze_gridveg_dates_pattern.py's summary passes):
    exact ``count_distinct`` is a full shuffle of the distinct pairs
    per column, and exact percentiles a global sort; HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) and the
    KLL-style ``percentile_approx`` sketch both merge map-side, so
    the WHOLE profile over every column is a single scan + one
    fixed-width reduce, no matter how wide the table.

    Numeric min/max/percentiles are cast to double; non-numeric
    columns report nulls for those fields but still count/distinct.
    """
    num_types = {"int", "bigint", "smallint", "tinyint", "double",
                 "float", "decimal", "date", "timestamp"}

    def is_num(dt: str) -> bool:
        return dt.split("(")[0] in num_types

    dtypes = dict(df.dtypes)
    cols = cols or list(df.columns)
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__n"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nn"))
        aggs.append(
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__ad")
        )
        if is_num(dtypes[c]):
            v = F.col(c).cast("double")
            aggs.append(F.min(v).alias(f"{c}__mn"))
            aggs.append(F.max(v).alias(f"{c}__mx"))
            aggs.append(
                F.percentile_approx(
                    v, list(percentiles), 10_000
                ).alias(f"{c}__pc")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mx"))
            aggs.append(
                F.lit(None)
                .cast("array<double>")
                .alias(f"{c}__pc")
            )
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__ad").alias("approx_distinct"),
            F.col(f"{c}__mn").alias("min"),
            F.col(f"{c}__mx").alias("max"),
            F.col(f"{c}__pc").alias("percentiles"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")
