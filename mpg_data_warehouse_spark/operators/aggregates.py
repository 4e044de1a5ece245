"""Aggregation operators (reference §2.4 A1-A11, §2.5 W1, §2.7 U1-U3).

Everything here is a thin, named composition of built-in functions —
Catalyst plans partial (map-side) + final hash aggregation
automatically, which is exactly the "push the GROUP BY into the
warehouse" optimization the reference performs by hand
(notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:301-313).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_count_scaled(
    df: DataFrame,
    keys: list[str],
    count_col: str,
    scale: float,
    alias: str,
) -> DataFrame:
    """Group-by count with constant scaling — the flagship query shape
    (reference A1: COUNT(intercept_ground_code)/2 AS intercepts_pct,
    200 transect points per survey → percent cover;
    notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:301-313)."""
    return df.groupBy(*keys).agg(
        (F.count(count_col) / F.lit(scale)).alias(alias)
    )


def group_sum(
    df: DataFrame, keys: list[str], sum_col: str, alias: str
) -> DataFrame:
    """Group-by sum (reference A2: detection_rate = sum(intercepts_pct)
    per survey × functional group;
    notebooks/gridVeg_plant_functional_groups_WRANGLE.ipynb:508-511)."""
    return df.groupBy(*keys).agg(F.sum(sum_col).alias(alias))


def multiples(df: DataFrame, keys: list[str], alias: str = "n") -> DataFrame:
    """Keys observed more than once (reference A3:
    group_by %>% summarise(n=n()) %>% filter(n>1);
    notebooks/gridVeg_species_richness_WRANGLE.ipynb:740-746)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
        .filter(F.col(alias) > 1)
    )


def drop_keyed_duplicates(
    df: DataFrame, supplemental: DataFrame, keys: list[str]
) -> DataFrame:
    """Remove supplemental rows whose key already appears ≥2× overall
    (reference J7 anti_join on the 'multiple_key';
    notebooks/gridVeg_species_richness_WRANGLE.ipynb:858-862).
    NULL-SAFE on the keys: dplyr's anti_join matches NAs to NAs
    (na_matches="na"), so a null key that is a multiple must drop its
    supplemental rows too — a plain equi-anti-join never matches
    nulls and would keep them."""
    from functools import reduce

    m = multiples(df, keys).select(*keys)
    cond = reduce(
        lambda a, b: a & b,
        [supplemental[k].eqNullSafe(m[k]) for k in keys],
    )
    return supplemental.join(m, cond, "left_anti")


def distinct_count_by(
    df: DataFrame, group: str, distinct_col: str, alias: str, approx: bool = False
) -> DataFrame:
    """Per-group count-distinct (reference A4: n_distinct(survey_ID)
    per year). ``approx=True`` swaps in HyperLogLog++
    (approx_count_distinct) — at 100 TB an exact count-distinct is a
    full shuffle of the distinct pairs; HLL is one pass."""
    agg = (
        F.approx_count_distinct(distinct_col)
        if approx
        else F.countDistinct(distinct_col)
    )
    return df.groupBy(group).agg(agg.alias(alias))


def string_agg_ordered_limited(
    df: DataFrame, keys: list[str], value_col: str, limit: int, alias: str
) -> DataFrame:
    """Ordered, limited string aggregation (reference A6: BigQuery
    STRING_AGG(CAST(date AS STRING) ORDER BY date LIMIT 3),
    src/investigate_further_gridveg_dates.py:20). No single Spark
    builtin — composed as collect_list → array_sort → slice →
    transform → concat_ws, all JVM-side. The sort runs on the
    ORIGINAL values (struct first-field ordering), not their string
    casts: ORDER BY a numeric column must put 2 before 10, which a
    lexical sort of the casts reverses (ISO dates/strings coincide
    either way). NULL values are excluded BEFORE the ranked slice
    (STRING_AGG semantics): a bare struct(v, s) is never null, so a
    null-v struct would sort first and burn one of the ``limit``
    slots while emitting nothing — the when() below yields a null
    struct for null values, which collect_list skips.

    BOUNDED two-level top-k (r12): ``collect_list`` has no reducing
    partial aggregation, so a single-level groupBy makes the final
    task per group hold and sort EVERY row of that group — for
    low-cardinality keys (the reference's shape is 3 return-flag
    groups) that is unbounded per-group state in one task, a scale
    killer at 100 TB. Instead the aggregation runs twice: first keyed
    by (keys, spark_partition_id()) — each (group, partition) cell
    holds at most one input partition's rows, and its output is
    sliced to the local smallest-``limit`` BEFORE the second shuffle —
    then a final top-k over the ≤ limit×P candidate structs per
    group. Duplicates are preserved exactly (each partition
    contributes its own copies, and the global smallest-k multiset is
    always contained in the union of per-partition smallest-k), so
    the result is identical to the single-level form."""
    struct_val = F.when(
        F.col(value_col).isNotNull(),
        F.struct(
            F.col(value_col).alias("v"),
            F.col(value_col).cast("string").alias("s"),
        ),
    )
    local = df.groupBy(
        *keys, F.spark_partition_id().alias("_pid")
    ).agg(
        F.slice(F.array_sort(F.collect_list(struct_val)), 1, limit).alias(
            "_cand"
        )
    )
    return local.groupBy(*keys).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("_cand"))),
                    1,
                    limit,
                ),
                lambda x: x["s"],
            ),
        ).alias(alias)
    )


def value_counts(df: DataFrame, col: str, desc: bool = True) -> DataFrame:
    """Frequency table (reference A10: pandas value_counts —
    src/explore_gridveg.py:69-81)."""
    out = df.groupBy(col).agg(F.count(F.lit(1)).alias("count"))
    return out.orderBy(F.col("count").desc() if desc else F.col(col))


def union_tagged(
    frames: list[tuple[DataFrame, str]], tag_col: str
) -> DataFrame:
    """Union-by-name with a literal provenance tag per branch
    (reference U1/U2: bind_rows of detections tagged detection_type;
    notebooks/gridVeg_species_richness_WRANGLE.ipynb:688-691)."""
    tagged = [df.withColumn(tag_col, F.lit(tag)) for df, tag in frames]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    decimals: int = 4,
) -> DataFrame:
    """Exact per-group quantiles (linear interpolation) of a numeric
    column — the profiling step before outlier filtering / length
    bucketing of a corpus.

    Uses the exact ``percentile`` aggregate (sort-based within group):
    right for profiling grouped data where each group fits an executor.
    For a single global quantile over 100 TB use
    ``percentile_approx`` (KLL-sketch, bounded memory, mergeable
    map-side) instead — exact global percentile would sort the world.
    DuckDB oracle mirror: ``quantile_cont(v, p)`` (same type-7
    interpolation), rounded identically on both sides.
    """
    return df.groupBy(*group_cols).agg(*quantile_aggs(value_col, probs, decimals))


def quantile_aggs(
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    decimals: int = 4,
) -> list:
    """The aggregate expressions behind ``group_quantiles``, exposed so
    composite profiling queries can fold them into ONE hash-agg pass
    alongside other aggregates instead of re-scanning the fact table
    per profiling family."""
    return [
        F.round(F.percentile(F.col(value_col), F.lit(p)), decimals).alias(
            f"p{int(p * 100):02d}"
        )
        for p in probs
    ]


def pivot_counts(
    df: DataFrame,
    row_key: list[str],
    pivot_col: str,
    values: list[str],
    prefix: str = "n_",
) -> DataFrame:
    """Cross-tab: one row per ``row_key``, one count column per listed
    ``pivot_col`` value, absent combinations as 0 (not null).

    Passing ``values`` explicitly matters at scale twice over: it
    skips the extra distinct-values job Spark otherwise runs, and it
    keeps the output schema static (a runtime-discovered pivot can
    explode to millions of columns on dirty data). One shuffle on
    ``row_key``; the pivot itself is map-side conditional counting.
    Output columns are ``prefix + lowercased value``.
    """
    out = df.groupBy(*row_key).pivot(pivot_col, values).agg(F.count(F.lit(1)))
    renamed = out.select(
        *row_key,
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(
                f"{prefix}{v.lower()}"
            )
            for v in values
        ],
    )
    return renamed


def group_corr_stats(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group bivariate profile: Pearson correlation, sample
    covariance, and sample stddevs — the feature-relationship scan run
    before building scaling/weighting heuristics. Single hash-agg
    (all four moments accumulate in one pass, partial-agg friendly);
    rounding bounds accumulation-order drift across engines."""
    return df.groupBy(*group_cols).agg(*corr_aggs(x_col, y_col, decimals))


def corr_aggs(x_col: str, y_col: str, decimals: int = 6) -> list:
    """The aggregate expressions behind ``group_corr_stats`` — see
    ``quantile_aggs`` for why they are exposed."""
    return [
        F.round(F.corr(x_col, y_col), decimals).alias("corr_xy"),
        F.round(F.covar_samp(x_col, y_col), decimals).alias("covar_xy"),
        F.round(F.stddev_samp(x_col), decimals).alias("stddev_x"),
        F.round(F.stddev_samp(y_col), decimals).alias("stddev_y"),
    ]


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    max_bin: int,
) -> DataFrame:
    """Fixed-width histogram: bucket = min(floor(v / width), max_bin),
    counted per bucket. Engine-agnostic arithmetic (plain floor-of-
    division — deliberately not width_bucket, which DuckDB lacks), so
    oracles replay it verbatim. One tiny shuffle of ≤ max_bin+1 rows
    after map-side combine — histogram of 100 TB costs one scan."""
    bucket = F.least(
        F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(max_bin)
    ).cast("long")
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
