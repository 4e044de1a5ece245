"""Deterministic sampling: reproducibility, stratum rates, and the
disjoint/exhaustive guarantee of the train/holdout split."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    split_train_holdout,
    stratified_sample,
)

from tests.conftest import SF_ORACLE


def _orders(spark):
    return spark.read.parquet(f"{SF_ORACLE}/orders.parquet")


def test_deterministic_sample_reproducible_and_partitioning_independent(spark):
    orders = _orders(spark)
    s1 = deterministic_sample(orders, "o_orderkey", 0.2)
    s2 = deterministic_sample(orders.repartition(13), "o_orderkey", 0.2)
    keys1 = {r.o_orderkey for r in s1.select("o_orderkey").collect()}
    keys2 = {r.o_orderkey for r in s2.select("o_orderkey").collect()}
    assert keys1 == keys2 and keys1  # same rows regardless of layout


def test_deterministic_sample_rate_close_to_nominal(spark):
    orders = _orders(spark)
    total = orders.count()
    got = deterministic_sample(orders, "o_orderkey", 0.2).count()
    assert abs(got / total - 0.2) < 0.02  # hash-uniform keys → ±2%


def test_stratified_rates_differ_per_stratum(spark):
    orders = _orders(spark)
    sample = stratified_sample(
        orders,
        strata="o_orderpriority",
        key="o_orderkey",
        rates={"1-URGENT": 0.5, "2-HIGH": 0.25},
        default_rate=0.05,
    )
    base = {r["o_orderpriority"]: r["n"] for r in
            orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    got = {r["o_orderpriority"]: r["n"] for r in
           sample.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    assert abs(got["1-URGENT"] / base["1-URGENT"] - 0.5) < 0.05
    assert abs(got["2-HIGH"] / base["2-HIGH"] - 0.25) < 0.05
    assert got.get("5-LOW", 0) / base["5-LOW"] < 0.10


def test_split_disjoint_and_exhaustive(spark):
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    train, hold = split_train_holdout(cust, "c_custkey", 0.1)
    n, nt, nh = cust.count(), train.count(), hold.count()
    assert nt + nh == n
    overlap = train.select("c_custkey").intersect(hold.select("c_custkey"))
    assert overlap.count() == 0
    assert 0.05 < nh / n < 0.15


def test_sampling_is_map_side_only(spark):
    """Scale contract: the sample filter must not introduce a shuffle."""
    orders = _orders(spark)
    plan = deterministic_sample(orders, "o_orderkey", 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_bucket_range(spark):
    orders = _orders(spark)
    row = orders.select(
        F.min(hash_bucket("o_orderkey", 100)).alias("lo"),
        F.max(hash_bucket("o_orderkey", 100)).alias("hi"),
    ).first()
    assert row.lo >= 0 and row.hi <= 99


def test_budget_rebalance_hits_targets(spark):
    """Each stratum's kept weight must land near the target (under it
    on average, since rates are capped at 1.0), and strata already
    under budget must be kept whole."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.sampling import budget_rebalance_sample

    rows = [(f"d{s}_{i}", f"s{s}", 10) for s in range(3) for i in range(200)]
    rows += [("tiny1", "small", 10), ("tiny2", "small", 10)]  # 20 < target
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    kept = budget_rebalance_sample(
        df, strata="source", key="doc_id", weight="n_tok", target_per_stratum=500.0
    )
    got = {
        r.source: r.w
        for r in kept.groupBy("source").agg(F.sum("n_tok").alias("w")).collect()
    }
    # under-budget stratum kept in full
    assert got["small"] == 20
    # 2000-token strata sampled toward 500 (rate 0.25) — hash noise at
    # n=200 docs is ~±20%
    for s in range(3):
        assert 300 <= got[f"s{s}"] <= 700


def test_budget_rebalance_reproducible(spark):
    from mpg_data_warehouse_spark.operators.sampling import budget_rebalance_sample

    rows = [(f"d{i}", f"s{i%4}", 5 + i % 7) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    a = budget_rebalance_sample(df, "source", "doc_id", "n_tok", 200.0)
    b = budget_rebalance_sample(df.repartition(11), "source", "doc_id", "n_tok", 200.0)
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_deterministic_shuffle_reproducible_and_seeded(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    o1 = [r.doc_id for r in deterministic_shuffle(df, "doc_id", 1).collect()]
    o2 = [r.doc_id for r in deterministic_shuffle(df, "doc_id", 1).collect()]
    o3 = [r.doc_id for r in deterministic_shuffle(df, "doc_id", 2).collect()]
    assert o1 == o2                       # same seed -> same order
    assert o1 != o3                       # new seed -> new permutation
    assert sorted(o1) == list(range(500)) # a permutation, nothing lost
    assert o1 != list(range(500))         # actually shuffled


def test_deterministic_shuffle_partitioned_form(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    out = deterministic_shuffle(df, "doc_id", 3, num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert sorted(r.doc_id for r in out.collect()) == list(range(500))


def test_cap_per_group_keeps_best_by_order(spark):
    from pyspark.sql import Row, functions as F

    from mpg_data_warehouse_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [
            Row(doc_id=i, source="big" if i < 10 else "small", q=float(i))
            for i in range(13)
        ]
    )
    capped = cap_per_group(
        df, "source", cap=3, order_by=[F.col("q").desc()]
    )
    got = {r.source: sorted(r2.doc_id for r2 in capped.collect() if r2.source == r.source) for r in capped.collect()}
    # big keeps its 3 highest-q docs; small (3 docs) survives whole
    assert got["big"] == [7, 8, 9]
    assert got["small"] == [10, 11, 12]


def test_cap_per_group_default_keeps_earliest(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s") for i in range(5)]
    )
    kept = sorted(r.doc_id for r in cap_per_group(df, "source", 2).collect())
    assert kept == [0, 1]


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def _dsir_corpora(spark):
    from pyspark.sql import Row

    sci = [
        "the experiment measured particle decay rates in the detector",
        "quantum field theory predicts the observed particle spectrum",
        "detector calibration improved measurement of decay channels",
    ]
    chat = [
        "lol that movie was so great you have to see it",
        "omg cant believe the game last night so wild",
        "haha yeah totally agree see you at the party",
    ]
    target = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(sci)]
    )
    raw = spark.createDataFrame(
        [Row(doc_id=100 + i, text=t) for i, t in enumerate(sci + chat)]
    )
    return raw, target


def test_dsir_weights_rank_on_target_docs_higher(spark):
    from mpg_data_warehouse_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, target = _dsir_corpora(spark)
    got = {
        r.doc_id: r.dsir_logw
        for r in dsir_importance_weights(raw, target).collect()
    }
    assert len(got) == 6
    sci_w = [got[i] for i in (100, 101, 102)]
    chat_w = [got[i] for i in (103, 104, 105)]
    assert min(sci_w) > max(chat_w)


def test_dsir_resample_prefers_target_like_and_is_deterministic(spark):
    from mpg_data_warehouse_spark.operators.sampling import dsir_resample

    raw, target = _dsir_corpora(spark)
    pick = lambda seed: sorted(
        r.doc_id for r in dsir_resample(raw, target, n=3, seed=seed).collect()
    )
    sel = pick(0)
    assert len(sel) == 3
    # heavily separated weights: the science docs dominate the draw
    assert set(sel) <= {100, 101, 102}
    # same seed -> identical draw; the draw is a pure function of input
    assert sel == pick(0)


def test_dsir_featureless_docs_get_zero_weight(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, target = _dsir_corpora(spark)
    raw2 = raw.unionByName(
        spark.createDataFrame([Row(doc_id=999, text="")])
    )
    got = {
        r.doc_id: r.dsir_logw
        for r in dsir_importance_weights(raw2, target).collect()
    }
    assert got[999] == 0.0


def test_null_keys_land_in_exactly_one_split(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import (
        split_train_holdout,
    )

    df = spark.createDataFrame(
        [Row(k="a"), Row(k="b"), Row(k=None)]
    )
    train, hold = split_train_holdout(df, "k", holdout_fraction=0.5)
    n_train, n_hold = train.count(), hold.count()
    assert n_train + n_hold == 3  # null row vanished from neither side
    # and the null row's side is deterministic (bucket 0 -> holdout)
    assert hold.where("k is null").count() == 1


def test_rebalance_outputs_carry_no_internal_columns(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import (
        budget_rebalance_sample,
        temperature_mixture_sample,
    )

    df = spark.createDataFrame(
        [Row(src="a", doc_id=i, w=1.0) for i in range(10)]
        + [Row(src="b", doc_id=100 + i, w=1.0) for i in range(10)]
    )
    out1 = budget_rebalance_sample(df, "src", "doc_id", "w", 5.0)
    assert set(out1.columns) == {"src", "doc_id", "w"}
    out2 = temperature_mixture_sample(df, "src", "doc_id", "w", 0.5, 10.0)
    assert set(out2.columns) == {"src", "doc_id", "w"}


def test_dsir_md5_grams_match_reference(spark):
    """Regression: `lambda i, n=n:` inside transform() has arity 2,
    so PySpark bound it as the (element, index) binary form and n
    silently became the array index — every DSIR feature was a junk
    slice. Pin the hashed buckets of a known text against values
    computed independently (md5 prefixes of the five true n-grams)."""
    import hashlib

    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sampling import (
        _hashed_ngram_buckets,
    )

    text = "Alpha beta  gamma"
    expected = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 512
        for g in ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    ]
    df = spark.createDataFrame([Row(text=text)])
    got = df.select(
        _hashed_ngram_buckets("text", 512, 2, "md5").alias("b")
    ).first()["b"]
    assert got == expected
