"""Validation gates (reference P10-P13 → SURVEY §5 test analogs)."""

from __future__ import annotations

from pyspark.sql import Row

from mpg_data_warehouse_spark.operators.validate import (
    TRANSECT_POINT_PATTERN,
    validate,
)
from mpg_data_warehouse_spark.sources.readers import any_null_rows, null_audit


def test_validate_passes_clean(spark):
    df = spark.createDataFrame(
        [Row(survey_ID="a", transect_point="N1"), Row(survey_ID="b", transect_point="W50")]
    )
    rep = validate(
        df,
        required=["survey_ID"],
        patterns={"transect_point": TRANSECT_POINT_PATTERN},
    )
    assert rep.ok and rep.total_rows == 2


def test_validate_flags_nulls_and_bad_format(spark):
    df = spark.createDataFrame(
        [
            Row(survey_ID=None, transect_point="N1"),
            Row(survey_ID="b", transect_point="X9"),
            Row(survey_ID="c", transect_point="N123"),
        ]
    )
    rep = validate(
        df,
        required=["survey_ID"],
        patterns={"transect_point": TRANSECT_POINT_PATTERN},
    )
    assert not rep.ok
    assert rep.null_violations == {"survey_ID": 1}
    assert rep.pattern_violations == {"transect_point": 2}


def test_null_audit_single_row(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=None, b=None), Row(a=3, b="x")],
        schema="a int, b string",
    )
    row = null_audit(df).collect()[0]
    assert row.a == 1 and row.b == 2


def test_any_null_rows(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=None, b="y"), Row(a=3, b=None)],
        schema="a int, b string",
    )
    assert any_null_rows(df).count() == 2
