"""Declarative expectation suites: one-pass row rules, relational
rules (unique / foreign key), thresholds, and the raising gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.expectations import (
    assert_suite,
    custom,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    run_suite,
    unique,
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, grade="A", score=0.9, code="N1"),
            Row(id=2, grade="B", score=0.5, code="E12"),
            Row(id=3, grade="Z", score=1.7, code="bad"),   # set+range+regex
            Row(id=4, grade=None, score=None, code="S3"),  # nulls
            Row(id=4, grade="A", score=0.1, code="W4"),    # dup id
        ]
    )


def test_row_rules_one_pass(spark):
    res = {
        r.rule: r
        for r in run_suite(
            _df(spark),
            [
                not_null("grade"),
                in_set("grade", ["A", "B", "C"]),
                in_range("score", lo=0.0, hi=1.0),
                matches("code", r"^[NSEW]\d{1,2}$"),
                custom("score_above_0", F.col("score") > 0),
            ],
        ).collect()
    }
    assert res["not_null(grade)"].violations == 1
    assert res["in_set(grade)"].violations == 1          # Z (null exempt)
    assert res["in_range(score)"].violations == 2        # 1.7 and null
    assert res["matches(code)"].violations == 1          # 'bad'
    assert res["score_above_0"].violations == 1          # null -> violation
    assert all(r.total == 5 for r in res.values())
    assert not res["not_null(grade)"].passed


def test_unique_and_threshold(spark):
    res = {r.rule: r for r in run_suite(
        _df(spark),
        [
            unique("id"),
            not_null("grade", threshold=0.25),  # 1/5 = 0.2 <= 0.25 -> pass
        ],
    ).collect()}
    u = res["unique(id)"]
    assert u.violations == 2 and not u.passed   # both rows of dup key count
    assert res["not_null(grade)"].passed


def test_foreign_key_orphans(spark):
    ref = spark.createDataFrame([Row(gid="A"), Row(gid="B")])
    res = run_suite(
        _df(spark),
        [foreign_key("grade", ref, ref_keys=("gid",))],
    ).collect()[0]
    assert res.violations == 1                  # Z orphan; null dropped
    assert not res.passed


def test_assert_suite_raises_with_detail(spark):
    with pytest.raises(AssertionError, match="not_null\\(grade\\): 1/5"):
        assert_suite(_df(spark), [not_null("grade")])
    # passing suite returns the report
    out = assert_suite(_df(spark), [not_null("id")])
    assert out.collect()[0].passed


def test_suite_is_single_job_for_row_rules(spark):
    """All row-level rules compile into one aggregate plan."""
    df = _df(spark)
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        F.count(F.when(F.col("grade").isNull(), 1)).alias("v0"),
        F.count(F.when(F.col("score").cast("double").isNull()
                       | (F.col("score") > 1.0), 1)).alias("v1"),
    )
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # partial+final, not per rule


def test_split_by_rules_routes_rows(spark):
    from mpg_data_warehouse_spark.operators.expectations import (
        split_by_rules,
    )

    good, bad = split_by_rules(
        _df(spark),
        [not_null("grade"), in_range("score", lo=0.0, hi=1.0)],
    )
    good_ids = sorted(r.id for r in good.collect())
    assert good_ids == [1, 2, 4]  # ids 3 (range) and 4-null row out
    q = {(r.id, r.grade): r._violated for r in bad.collect()}
    assert q[(3, "Z")] == ["in_range(score)"]
    assert set(q[(4, None)]) == {"not_null(grade)", "in_range(score)"}
    assert good.columns == _df(spark).columns


def test_split_by_rules_rejects_relational(spark):
    from mpg_data_warehouse_spark.operators.expectations import (
        split_by_rules,
    )

    with pytest.raises(ValueError, match="row-level"):
        split_by_rules(_df(spark), [unique("id")])


def test_in_range_counts_malformed_strings_instead_of_crashing(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.expectations import (
        in_range,
        run_suite,
    )

    df = spark.createDataFrame(
        [Row(price="10"), Row(price="N/A"), Row(price="200")]
    )
    res = {
        r.rule: r
        for r in run_suite(
            df, [in_range("price", lo=0.0, hi=100.0)]
        ).collect()
    }
    (only,) = res.values()
    assert only.violations == 2  # 'N/A' counts, never crashes; 200 > hi


def test_in_range_lower_bound_flags_nan(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.expectations import (
        in_range,
        run_suite,
    )

    df = spark.createDataFrame(
        [Row(score=1.0), Row(score=float("nan"))]
    )
    (res,) = run_suite(df, [in_range("score", lo=0.0)]).collect()
    assert res.violations == 1  # NaN is not in range


def test_unique_ignores_null_keys(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.expectations import (
        run_suite,
        unique,
    )

    df = spark.createDataFrame(
        [Row(email=None), Row(email=None), Row(email="a@x"), Row(email="a@x")]
    )
    (res,) = run_suite(df, [unique("email")]).collect()
    assert res.violations == 2  # the two 'a@x' rows; nulls exempt
