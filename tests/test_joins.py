"""Join-strategy helpers: salted joins must be result-identical to
plain joins; bucketed tables must co-locate (no Exchange)."""

from __future__ import annotations

from pyspark.sql import Row

from mpg_data_warehouse_spark.operators import joins as J


def _skewed(spark):
    # hot key 1 (80 rows), cold keys 2..9 (1 row each)
    rows = [Row(k=1, v=i) for i in range(80)] + [
        Row(k=i, v=i) for i in range(2, 10)
    ]
    return spark.createDataFrame(rows)


def _dim(spark):
    return spark.createDataFrame([Row(k=i, name=f"n{i}") for i in range(1, 10)])


def test_salted_join_matches_plain(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = big.join(dim, ["k"]).select("k", "v", "name")
    salted = J.salted_join(big, dim, ["k"]).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    dim = _dim(spark).filter("k <= 3")
    plain = big.join(dim, ["k"], "left").select("k", "v", "name")
    salted = J.salted_join(big, dim, ["k"], how="left").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect(), )) == sorted(
        map(tuple, salted.collect())
    )


def test_bucketed_join_shuffle_free(spark):
    big, dim = _skewed(spark), _dim(spark)
    # disable auto-broadcast so the test exercises the SMJ path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        J.write_bucketed(big, "b_fact", ["k"], n_buckets=4, sort_cols=["k"])
        J.write_bucketed(dim, "b_dim", ["k"], n_buckets=4, sort_cols=["k"])
        assert J.bucketed_join_is_shuffle_free(spark, "b_fact", "b_dim", ["k"])
        # same join on unbucketed frames DOES shuffle
        plain_plan = (
            big.join(dim, ["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_fact")
        spark.sql("DROP TABLE IF EXISTS b_dim")
