"""Scoped RDD storage (session.run_scoped): query builders that
persist/cache/localCheckpoint corpus-sized intermediates must release
them deterministically once the result is materialized — the
long-lived-driver contract bench.py relies on now that it runs with
no per-measurement clearCache (the r8 session-age artifact's fix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.session import (
    persistent_rdd_ids,
    release_rdd_storage,
    run_scoped,
)

SF = "/root/testdata/sf0.001"


def test_run_scoped_releases_build_storage(spark):
    before = persistent_rdd_ids(spark)

    def build():
        big = spark.range(10_000).withColumn("y", F.col("id") * 2).persist()
        mid = big.filter("id % 2 = 0").localCheckpoint(eager=True)
        return mid.groupBy((F.col("id") % 10).alias("g")).count()

    out = run_scoped(spark, build)
    after = persistent_rdd_ids(spark)
    new = after - before
    # exactly the result's own checkpoint survives
    assert len(new) == 1
    assert out.count() == 5  # and the result is still readable
    release_rdd_storage(spark, new)


def test_run_scoped_preserves_caller_sql_cache(spark):
    """A pre-existing caller cache (an application-cached shared
    dimension) must SURVIVE a scope that leaks its own cache — the
    global clearCache shortcut is only legal when the SQL cache was
    empty at scope entry (r9 ADVICE finding)."""
    from mpg_data_warehouse_spark.session import _cached_plan_handles

    dim = spark.range(100).withColumn("d", F.col("id") * 3).cache()
    dim.count()
    assert dim.is_cached
    before = persistent_rdd_ids(spark)
    entries_before = _cached_plan_handles(spark)
    assert entries_before is not None
    try:

        def build():
            leak = spark.range(5_000).withColumn("y", F.col("id") + 1)
            leak = leak.cache()
            leak.count()
            return leak.groupBy((F.col("id") % 7).alias("g")).count()

        out = run_scoped(spark, build)
        assert out.count() == 7
        # the caller's cache entry is untouched
        assert dim.is_cached, "run_scoped dropped a pre-existing cache"
        # and the scope's stray RDD blocks were still released: only
        # the result checkpoint is new
        new = persistent_rdd_ids(spark) - before
        assert len(new) == 1, f"scope leaked blocks: {sorted(new)}"
        release_rdd_storage(spark, new)
        # NO ZOMBIE entries (r10 review finding): the scope's leaked
        # CacheManager entry must be UNCACHED, not just have its RDD
        # blocks dropped — a dead entry short-circuits a later
        # identical .persist() into never caching again. The entry
        # COUNT returns to its pre-scope value (counted, not assumed
        # 1: a shared test session carries ambient entries from other
        # tests' frames).
        from mpg_data_warehouse_spark.session import _cached_plan_handles

        entries_after = _cached_plan_handles(spark)
        assert entries_after is not None
        leaked_entries = set(entries_after) - set(entries_before)
        assert not leaked_entries, (
            f"scope left {len(leaked_entries)} new CacheManager "
            "entries registered: zombie entries leaked"
        )
        # and the same plan re-persists for real: a fresh cache()
        # materializes blocks again instead of no-op'ing on a zombie
        releak = spark.range(5_000).withColumn("y", F.col("id") + 1).cache()
        releak.count()
        assert releak.storageLevel.useMemory, (
            "re-persist of the scope's plan did not take — zombie "
            "CacheManager entry intercepted it"
        )
        releak.unpersist()
    finally:
        dim.unpersist()


def test_scoped_queries_leave_storage_clean(spark):
    """Every _SCOPED_QUERIES entry must leave at most its own result
    checkpoint behind, and the scoped result must equal the raw
    builder's output (scoping is a storage contract, not a semantic
    one)."""
    from mpg_data_warehouse_spark.plans import driver_queries as dq

    for name in sorted(dq._SCOPED_QUERIES):
        assert name in dq.QUERIES, name
        before = persistent_rdd_ids(spark)
        df = dq.QUERIES[name](spark, SF)
        n = df.count()
        new = persistent_rdd_ids(spark) - before
        assert len(new) <= 1, f"{name} leaked storage: {sorted(new)}"
        raw = dq.QUERIES[name].__wrapped__(spark, SF)
        assert n == raw.count(), f"{name}: scoped result drifted"
        release_rdd_storage(spark, persistent_rdd_ids(spark) - before)


def test_unscoped_queries_do_not_hold_storage(spark):
    """The scoped set IS the leak set: a cheap unscoped
    representative must run storage-clean (guards against new
    un-registered persists creeping into query builders)."""
    from mpg_data_warehouse_spark.plans import driver_queries as dq

    for name in ("ground_cover_pct_complete", "group_multiples_having",
                  "window_partition_count", "species_richness_union_dedup"):
        before = persistent_rdd_ids(spark)
        dq.QUERIES[name](spark, SF).count()
        new = persistent_rdd_ids(spark) - before
        assert not new, f"{name} now holds storage: register it scoped"
