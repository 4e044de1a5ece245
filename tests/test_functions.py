"""Scalar function layer: pandas two-digit-year pivot parity (SURVEY
§7.4 #1), survey_sequence, null sentinels, coercion, composite keys."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.functions.cleaning import (
    clean_null_sentinels,
    coerce_double,
    coerce_long,
    composite_key,
    rename_columns,
    uuid_prefix,
)
from mpg_data_warehouse_spark.functions.dates import (
    parse_date_mdyy,
    rebuild_swapped_date,
    survey_sequence,
)


def test_parse_date_mdyy_pandas_pivot(spark):
    """pandas %y: 00-68 → 2000s, 69-99 → 1900s. Java's yy maps all to
    20yy — the engine must correct the 69-99 branch."""
    df = spark.createDataFrame(
        [Row(s="6/15/24"), Row(s="1/2/68"), Row(s="12/31/69"), Row(s="7/4/99")]
    )
    got = [r.d for r in df.select(parse_date_mdyy("s").alias("d")).collect()]
    assert got == [
        datetime.date(2024, 6, 15),
        datetime.date(2068, 1, 2),
        datetime.date(1969, 12, 31),
        datetime.date(1999, 7, 4),
    ]


def test_survey_sequence(spark):
    df = spark.createDataFrame([Row(year=y) for y in [2010, 2011, 2012, 2024]])
    got = [r.s for r in df.select(survey_sequence("year").alias("s")).collect()]
    assert got == ["2010", "2011-12", "2011-12", "2024"]


def test_rebuild_swapped_date(spark):
    """docs/gridveg_date_issue.md corruption: real 2011-08-16 stored
    as 2016-08-11 (DD↔YY swap) — rebuild inverts it."""
    df = spark.createDataFrame([Row(d=datetime.date(2031, 8, 16))])
    got = df.select(rebuild_swapped_date("d").alias("r")).collect()[0].r
    assert got == datetime.date(2016, 8, 31)


def test_null_sentinels_and_coercion(spark):
    df = spark.createDataFrame(
        [Row(x="12"), Row(x="12.0"), Row(x="NA"), Row(x=""), Row(x="  "), Row(x="7.5")]
    )
    longs = [r.v for r in df.select(coerce_long("x").alias("v")).collect()]
    assert longs == [12, 12, None, None, None, 7]
    dbls = [r.v for r in df.select(coerce_double("x").alias("v")).collect()]
    assert dbls == [12.0, 12.0, None, None, None, 7.5]
    cleaned = [
        r.v for r in df.select(clean_null_sentinels("x").alias("v")).collect()
    ]
    assert cleaned == ["12", "12.0", None, None, None, "7.5"]


def test_rename_columns_drops_unmapped(spark):
    df = spark.createDataFrame(
        [Row(**{"Survey Data::__kp_Survey": "s1", "zModificationTimestamp": "x"})]
    )
    out = rename_columns(df, {"Survey Data::__kp_Survey": "survey_ID"})
    assert out.columns == ["survey_ID"]


def test_composite_key_and_uuid_prefix(spark):
    df = spark.createDataFrame(
        [Row(a="D4CB77CE-1234-5678-9ABC-DEF012345678", b=42)]
    )
    row = df.select(
        composite_key("a", "b").alias("k"), uuid_prefix("a").alias("p")
    ).collect()[0]
    assert row.k == "D4CB77CE-1234-5678-9ABC-DEF012345678_42"
    assert row.p == "D4CB77CE"
