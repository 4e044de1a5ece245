"""Ranking / top-k-per-group operators.

The reference's only window function is a partitioned COUNT
(SURVEY.md §2.5 W1, src/analyze_gridveg_dates_pattern.py:73-79); the
ordered-ranking family here is the extension a training-data pipeline
needs constantly: best-k documents per language by quality, newest-k
snapshots per URL, top-k candidates per query.

Scale notes: ``row_number`` over (partition, order) is one shuffle on
the partition key plus a per-partition sort — Spark pushes a partial
top-k (``WindowGroupLimit``) below the shuffle when a ``rank <= k``
filter follows the window, so only k rows per group per input
partition cross the wire. That optimization is exactly why the filter
must stay adjacent to the window in the plan (keep this operator's
output un-cached between the window and the filter). Ties must be
broken by a deterministic final key or results are partitioning-
dependent — the ``order_by`` list you pass should end with a unique
column; ``topk_per_group`` asserts nothing but your oracle will.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["topk_per_group"]


def topk_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the top-k rows of each group under the given ordering,
    with the 1-based rank kept as ``rank_col``.

    One hash shuffle on ``partition_by`` + sort; WindowGroupLimit
    prunes to k rows per group map-side before the exchange.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= F.lit(k))
    )
