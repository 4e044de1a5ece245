"""Physical-layout behavior: year-partitioned tables prune at the
scan (the engine's standard fact layout — SURVEY §4 physical
partitioning), and the append path's anti-join rides that pruning."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark import fixtures as FX
from mpg_data_warehouse_spark.operators.append import anti_join_append


def test_year_partition_pruning(spark, tmp_path):
    table = str(tmp_path / "fact")
    meta = FX.survey_metadata(spark, n_surveys=30)
    meta.write.partitionBy("year").parquet(table)

    q = spark.read.parquet(table).filter(F.col("year") == 2024)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruned scan must list the year predicate as a partition
    # filter, not a data filter
    assert any(
        "PartitionFilters" in line and "2024" in line
        for line in plan.splitlines()
    ), plan
    got_years = {r.year for r in q.select("year").distinct().collect()}
    assert got_years <= {2024}


def test_anti_join_append_into_partitioned_table(spark, tmp_path):
    table = str(tmp_path / "fact2")
    meta = FX.survey_metadata(spark, n_surveys=20)
    meta.write.partitionBy("year").parquet(table)

    # A season batch: 5 rows already present + 3 brand-new surveys.
    dup = meta.limit(5)
    new = spark.createDataFrame(
        [
            Row(
                survey_ID=f"NEW{i}",
                grid_point=10 + i,
                year=2031,
                date=None,
                survey_sequence="2031",
                surveyor="ZZZ",
            )
            for i in range(3)
        ],
        meta.schema,
    )
    batch = dup.unionByName(new)
    res = anti_join_append(
        spark, batch, table, keys=["survey_ID"], partition_by=("year",)
    )
    assert res.appended_rows == 3
    assert res.duplicate_rows == 5
    assert res.reconciled
    # run again: idempotent, and the 2031 partition exists on disk
    res2 = anti_join_append(
        spark, batch, table, keys=["survey_ID"], partition_by=("year",)
    )
    assert res2.appended_rows == 0
    import os

    assert any(d.startswith("year=2031") for d in os.listdir(table))


def test_dynamic_partition_pruning(spark, tmp_path):
    """Star-join runtime pruning: a selective dim filter on the
    partition key must inject a dynamic pruning subquery into the
    fact scan (at 100 TB this skips whole partitions at runtime)."""
    fact_path = str(tmp_path / "dpp_fact")
    meta = FX.survey_metadata(spark, n_surveys=60)
    ground = FX.point_intercept_ground(spark, meta, points_per_survey=5)
    ground.write.partitionBy("year").parquet(fact_path)

    fact = spark.read.parquet(fact_path)
    dim = meta.select("year", "survey_sequence").distinct().filter(
        F.col("survey_sequence") == "2024"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # DPP via broadcast reuse needs the dim broadcastable (default)
        joined = fact.join(dim, "year").select("survey_ID", "year")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        got_years = {r.year for r in joined.select("year").distinct().collect()}
        assert got_years <= {2024}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed on the same key/count must join with ZERO
    shuffle: the bucket files are the pre-materialized shuffle output.
    Broadcast is disabled to force the merge-join regime the bucketing
    targets."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.sources.writers import write_bucketed_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed_table(
        orders, "orders_bkt", ["o_custkey"], 4, sort_cols=["o_custkey"]
    )
    write_bucketed_table(
        customer, "customer_bkt", ["c_custkey"], 4, sort_cols=["c_custkey"]
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_bkt")
            .join(
                spark.table("customer_bkt"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket-aligned: no shuffle at all
        assert "SelectedBucketsCount" in plan
        # correctness: same rows as the plain join
        want = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")
