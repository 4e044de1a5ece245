"""Skew/cardinality diagnostics and CBO table statistics — the
pre-flight tooling for picking physical join strategies at scale."""

from __future__ import annotations

from pyspark.sql import Row

from mpg_data_warehouse_spark.operators.diagnostics import (
    key_skew_report,
    suggest_salts,
)
from mpg_data_warehouse_spark.sources.catalog import analyze_table, save_as_table


def _skewed(spark):
    rows = (
        [Row(k="hot", v=i) for i in range(900)]
        + [Row(k="warm", v=i) for i in range(90)]
        + [Row(k=f"cold{i}", v=i) for i in range(10)]
    )
    return spark.createDataFrame(rows)


def test_key_skew_report_ranks_and_quantifies(spark):
    rep = key_skew_report(_skewed(spark), ["k"], top_n=3).collect()
    assert [r.k for r in rep] == ["hot", "warm", "cold0"]
    hot = rep[0]
    assert hot.n_rows == 900
    assert hot.row_share == 0.9
    # 12 distinct keys, 1000 rows → mean group 83.33; 900/83.33 = 10.8
    assert abs(hot.skew_ratio - 10.8) < 0.01


def test_suggest_salts_scales_with_hottest_key(spark):
    df = _skewed(spark)
    # hottest key = 900 rows; 100-row tasks → ceil(900/100) = 9 salts
    assert suggest_salts(df, ["k"], target_rows_per_task=100) == 9
    # nothing over the target → no salting
    assert suggest_salts(df, ["k"], target_rows_per_task=1000) == 1


def test_suggest_salts_empty_input(spark):
    empty = spark.createDataFrame([], "k string, v long")
    assert suggest_salts(empty, ["k"], target_rows_per_task=10) == 1


def test_analyze_table_records_cbo_stats(spark):
    df = spark.createDataFrame([Row(a=i, b=f"x{i}") for i in range(100)])
    save_as_table(df, "diag_stats_t")
    try:
        stats = analyze_table(spark, "diag_stats_t", columns=("a",))
        assert stats["rowCount"] == "100"
        assert int(stats["sizeInBytes"]) > 0
        # column-level NDV recorded in metadata
        desc = {
            r.info_name: r.info_value
            for r in spark.sql(
                "DESCRIBE EXTENDED diag_stats_t a"
            ).collect()
        }
        assert desc.get("distinct_count") == "100"
    finally:
        spark.sql("DROP TABLE IF EXISTS diag_stats_t")


def test_write_training_shards_bounded_and_deterministic(spark, tmp_path):
    from collections import defaultdict

    import pyarrow.parquet as pq

    from mpg_data_warehouse_spark.sources.writers import write_training_shards

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc number {i}") for i in range(1000)]
    )
    out1 = str(tmp_path / "shards1")
    write_training_shards(df, out1, "doc_id", rows_per_shard=200)

    back = spark.read.parquet(out1)
    assert back.count() == 1000
    assert back.select("doc_id").distinct().count() == 1000
    # every FILE respects the hard per-file ceiling
    import glob
    import os

    for f in glob.glob(os.path.join(out1, "shard=*", "*.parquet")):
        assert pq.ParquetFile(f).metadata.num_rows <= 200
    # ~5 shard directories (hash buckets of ceil(1000/200))
    shard_dirs = glob.glob(os.path.join(out1, "shard=*"))
    assert len(shard_dirs) == 5

    # deterministic row→shard mapping across re-exports
    out2 = str(tmp_path / "shards2")
    write_training_shards(df, out2, "doc_id", rows_per_shard=200)
    m1 = {r.doc_id: r.shard for r in spark.read.parquet(out1).collect()}
    m2 = {r.doc_id: r.shard for r in spark.read.parquet(out2).collect()}
    assert m1 == m2
    by_shard = defaultdict(int)
    for s in m1.values():
        by_shard[s] += 1
    assert sum(by_shard.values()) == 1000


def test_observe_stage_counts_without_extra_actions(spark):
    """Stage counters ride the single action: one write-style action
    populates every attached observation — no per-stage count() jobs."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.observability import (
        observe_stage,
        stage_metrics,
    )

    obs = stage_metrics(["raw", "filtered"])
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=10 * (i % 3 + 1)) for i in range(100)]
    )
    staged = observe_stage(df, obs["raw"], weight_col="n_tokens")
    kept = observe_stage(
        staged.filter(F.col("n_tokens") > 10), obs["filtered"],
        weight_col="n_tokens",
    )
    kept.write.format("noop").mode("overwrite").save()

    raw = obs["raw"].get
    filt = obs["filtered"].get
    assert raw["rows"] == 100
    assert raw["weight"] == sum(10 * (i % 3 + 1) for i in range(100))
    assert filt["rows"] == sum(1 for i in range(100) if 10 * (i % 3 + 1) > 10)
    assert filt["weight"] == sum(
        10 * (i % 3 + 1) for i in range(100) if 10 * (i % 3 + 1) > 10
    )
def test_write_training_shards_caller_supplied_count(spark, tmp_path):
    """total_rows sizes the grid without any pre-count pass; supplying
    the true count reproduces the default mapping exactly."""
    import glob
    import os

    import pyarrow.parquet as pq

    from mpg_data_warehouse_spark.sources.writers import write_training_shards

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc number {i}") for i in range(1000)]
    )
    out1 = str(tmp_path / "s_default")
    out2 = str(tmp_path / "s_supplied")
    write_training_shards(df, out1, "doc_id", rows_per_shard=200)
    write_training_shards(
        df, out2, "doc_id", rows_per_shard=200, total_rows=1000
    )
    m1 = {r.doc_id: r.shard for r in spark.read.parquet(out1).collect()}
    m2 = {r.doc_id: r.shard for r in spark.read.parquet(out2).collect()}
    assert m1 == m2

    # a stale estimate changes shard count, never the per-file ceiling
    out3 = str(tmp_path / "s_stale")
    write_training_shards(
        df, out3, "doc_id", rows_per_shard=200, total_rows=400
    )
    assert spark.read.parquet(out3).count() == 1000
    for f in glob.glob(os.path.join(out3, "shard=*", "*.parquet")):
        assert pq.ParquetFile(f).metadata.num_rows <= 200


def test_approx_profile_shapes_and_bounds(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.diagnostics import approx_profile

    df = spark.createDataFrame(
        [Row(i=n, s=f"s{n % 7}", x=float(n) if n % 10 else None)
         for n in range(1000)]
    )
    prof = {r.column: r for r in approx_profile(df).collect()}
    assert set(prof) == {"i", "s", "x"}
    assert prof["i"].n == 1000 and prof["i"].n_null == 0
    assert prof["x"].n_null == 100 and prof["x"].n == 900
    # HLL at rsd=0.05: distinct(i)=1000 within ~3 sigma
    assert abs(prof["i"].approx_distinct - 1000) <= 150
    assert abs(prof["s"].approx_distinct - 7) <= 1
    assert prof["i"].min == 0.0 and prof["i"].max == 999.0
    # string column: numeric stats null but counts real
    assert prof["s"].min is None and prof["s"].percentiles is None
    # median of 0..999 within sketch accuracy
    assert abs(prof["i"].percentiles[0] - 499.5) <= 10


def test_approx_profile_single_scan(spark):
    """The whole profile is ONE aggregate over one scan — no per-column
    jobs (plan has a single Aggregate over the relation)."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.diagnostics import approx_profile

    df = spark.createDataFrame([Row(a=1, b="x")])
    plan = approx_profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # partial+final, not per column
