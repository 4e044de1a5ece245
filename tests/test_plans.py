"""Plan contracts: physical-plan properties the engine promises
(broadcast dims, pushdown, pruning, no cartesian blowups) — guarded
so a refactor can't silently regress them."""

from __future__ import annotations

import pytest

from mpg_data_warehouse_spark.plans.driver_queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    # unwrap scoped queries (same as explain_digest/capture_plans):
    # the scoped wrapper returns an eager checkpoint whose plan is a
    # bare RDD scan — the contract is about the builder's real plan
    fn = getattr(QUERIES[name], "__wrapped__", QUERIES[name])
    return fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_multi_way_join_broadcasts_all_dims(spark):
    plan = _plan(spark, "multi_way_join_enrich")
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scans_prune_columns(spark):
    plan = _plan(spark, "multi_way_join_enrich")
    # lineitem scan must read only the 3 projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>" in plan


def test_flagship_grid_is_mapside_exploded(spark):
    plan = _plan(spark, "ground_cover_pct_complete")
    # complete_map: the completion grid is exploded map-side from the
    # literal code domain — no grid materialization, no grid-sized
    # join, and never a shuffle cartesian
    assert "Generate explode" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "regex_sentinel_filter")
    assert "PushedFilters: [" in plan


def test_anti_join_is_broadcast(spark):
    plan = _plan(spark, "membership_semi_anti")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "name",
    ["text_profile", "text_tokens_fingerprint"],
)
def test_text_queries_are_shuffle_free(spark, name):
    # single narrow projection: no Exchange anywhere in the plan
    assert "Exchange" not in _plan(spark, name)


def test_no_python_udfs_in_reference_queries(spark):
    # UD3 policy: zero Python UDFs outside the multimodal boundary
    for name in [
        "ground_cover_pct_complete",
        "functional_groups_detection_rate",
        "species_richness_union_dedup",
        "minhash_near_dup_pairs",
        "text_profile",
        "lsh_ann_topk",
    ]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multimodal_is_the_only_python_boundary(spark):
    plan = _plan(spark, "multimodal_frame_sample")
    assert "MapInPandas" in plan


def test_runtime_bloom_filter_on_selective_join(spark):
    """Scale contract: with the runtime bloom-filter rule enabled, a
    selective dim-side filter should inject a BloomFilter (or at least
    a runtime filter subquery) into the fact scan, cutting shuffle
    input before the join."""
    from tests.conftest import SF_ORACLE

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # local test data is far below the 10GB production default — the
        # contract under test is the injection mechanics, not the sizing
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # a broadcastable build side never needs a bloom filter — force
        # the shuffle-join regime the rule targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    # conf.get(k, None) returns the EXPLICITLY-set value or None — it
    # does not resolve SQL defaults, so unset-on-None restores the
    # session default instead of pinning the fallback literal (which
    # silently turned the rule off for every later test).
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        lineitem = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_snowflake_dims_broadcast(spark):
    """Q5-shaped snowflake: every dimension join must be broadcast —
    at most the lineitem-orders join may shuffle. A shuffle-join
    snowflake would move the fact once per dimension."""
    from mpg_data_warehouse_spark.plans.driver_queries import QUERIES
    from tests.conftest import SF_ORACLE

    plan = (
        QUERIES["local_supplier_revenue"](spark, SF_ORACLE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_aqe_skew_join_splits_on_session_config(spark):
    """The engine's session config (session.get_spark) enables AQE
    skew-join splitting: a sort-merge join with one dominant key must
    come out of adaptive planning with the skewed partition SPLIT
    (``skew=true`` in the final plan). ``joins.salted_join`` is the
    documented FALLBACK for the pathological tail, not the default
    path — moderate skew is the optimizer's job.

    Thresholds are lowered to test-data scale (the defaults trigger at
    256 MB partitions); skewJoin.enabled itself comes from the session
    defaults, which is the behavior under test."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    tuned = {
        # force a sort-merge join (skew splitting only applies there)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # recognize/split skew at kilobyte scale for the tiny fixture
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        big = spark.range(0, 100_000).select(
            F.when(F.col("id") % 20 < 19, F.lit(0))
            .otherwise(F.col("id") % 20)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        dim = spark.range(0, 20).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id")).alias("d"),
        )
        joined = big.join(dim, "k")
        # collect() executes THIS DataFrame's own query execution, so
        # its adaptive plan is finalized (count() would plan separately)
        assert len(joined.collect()) == 100_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_large_probe_side(spark, tmp_path):
    """Runtime row-level filtering: a selective dim filter on one side
    of a shuffle join makes the optimizer build a bloom filter over the
    dim's join keys and push ``might_contain`` into the FACT scan side,
    so non-matching fact rows die before the shuffle. At 100 TB this is
    the difference between shuffling the whole fact table and shuffling
    only the keys that can match — and like AQE skew handling it comes
    from the session's optimizer config, not hand-written pre-joins.

    Thresholds are lowered to fixture scale (the application-side
    default triggers at 10 GB scans); ``runtime.bloomFilter.enabled``
    itself is the stock default under test."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    spark.range(0, 50_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), F.col("id")).alias("pay"),
    ).write.parquet(fact_path)
    spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    ).write.parquet(dim_path)

    tuned = {
        # force a shuffle join: bloom injection targets the shuffle path
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # fixture-sized application-side threshold (default 10GB)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where("grp = 3")
        joined = fact.join(dim, "k")
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized, optimized[:2000]
        physical = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in physical, physical[:2000]
        # and the filtered join still answers correctly
        assert joined.count() == dim.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
