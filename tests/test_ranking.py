"""Top-k-per-group ranking: correctness of the cut, deterministic
tie-break, and the WindowGroupLimit map-side pruning contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.ranking import topk_per_group

from tests.conftest import SF_ORACLE


def _orders(spark):
    return spark.read.parquet(f"{SF_ORACLE}/orders.parquet")


def test_topk_exact_counts_and_ordering(spark):
    out = topk_per_group(
        _orders(spark),
        partition_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=5,
    )
    per_group = out.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 5 for r in per_group)
    # rank 1 really is the max price of its group
    top1 = {r.o_orderpriority: r.o_totalprice
            for r in out.filter("rn = 1").collect()}
    maxes = {r.o_orderpriority: r.mx
             for r in _orders(spark).groupBy("o_orderpriority")
             .agg(F.max("o_totalprice").alias("mx")).collect()}
    assert top1 == maxes


def test_topk_partitioning_independent(spark):
    args = dict(
        partition_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )
    a = topk_per_group(_orders(spark), **args)
    b = topk_per_group(_orders(spark).repartition(17), **args)
    rows = lambda df: {tuple(r) for r in  # noqa: E731
                       df.select("o_orderpriority", "rn", "o_orderkey").collect()}
    assert rows(a) == rows(b)


def test_window_group_limit_in_plan(spark):
    """Scale contract: the rn<=k filter must push a WindowGroupLimit
    below the exchange so only k rows per group per input partition
    cross the wire."""
    out = topk_per_group(
        _orders(spark),
        partition_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
