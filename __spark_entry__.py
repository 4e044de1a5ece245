"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ground-cover-%-style query
(group-count-scaled → complete() grid-fill → dim join → filter) on
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle; the registry lives
in ``mpg_data_warehouse_spark.plans.driver_queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mpg_data_warehouse_spark.plans import driver_queries as _dq

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dq.QUERIES["ground_cover_pct_complete"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    return dict(_dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. Keys absent here (vs
    ``queries()``) are non-SQL-expressible ops → rows-only check."""
    return dict(_dq.ORACLE)
