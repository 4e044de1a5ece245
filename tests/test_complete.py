"""complete() semantics pinned by the reference invariants (SURVEY §5):
cross of expand-domain × observed nesting tuples, zero-fill, NULL
categories preserved."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.complete import complete


def _base(spark):
    return spark.createDataFrame(
        [
            Row(survey="s1", grid=1, code="BG", pct=10.0),
            Row(survey="s1", grid=1, code="L", pct=2.5),
            Row(survey="s2", grid=2, code="BG", pct=1.0),
            Row(survey="s3", grid=1, code="WDT", pct=0.5),
        ]
    )


def test_cardinality_invariant(spark):
    """rows == n_distinct(nesting tuples) × n_distinct(expand values) —
    the reference's 1,242 × 23 = 28,556 check
    (gridVeg_plant_functional_groups_WRANGLE.ipynb:552-554)."""
    df = _base(spark)
    out = complete(df, expand=["code"], nesting=["survey", "grid"], fill={"pct": 0.0})
    assert out.count() == 3 * 3  # 3 observed (survey,grid) × 3 codes


def test_fill_and_preserve(spark):
    df = _base(spark)
    out = complete(df, expand=["code"], nesting=["survey", "grid"], fill={"pct": 0.0})
    rows = {(r.survey, r.grid, r.code): r.pct for r in out.collect()}
    assert rows[("s1", 1, "BG")] == 10.0  # original value preserved
    assert rows[("s2", 2, "L")] == 0.0  # grid-filled
    assert rows[("s2", 2, "WDT")] == 0.0
    # nesting uses OBSERVED tuples only: (s1,2) never observed → absent
    assert ("s1", 2, "BG") not in rows


def test_explicit_domain(spark):
    """expand_values supplies the full dimension domain, including
    codes never observed (the 18-code ground-cover dimension)."""
    df = _base(spark)
    domain = spark.createDataFrame([Row(code=c) for c in ["BG", "L", "WDT", "LIC"]])
    out = complete(
        df,
        expand=["code"],
        nesting=["survey", "grid"],
        fill={"pct": 0.0},
        expand_values=domain,
    )
    assert out.count() == 3 * 4
    assert out.filter((F.col("code") == "LIC") & (F.col("pct") != 0.0)).count() == 0


def test_null_category_preserved(spark):
    """tidyr keeps NULL group values as categories — upstream filters
    remove them first when unwanted (SURVEY §7.4 #2)."""
    df = spark.createDataFrame(
        [Row(survey="s1", code=None, pct=1.0), Row(survey="s2", code="BG", pct=2.0)]
    )
    out = complete(df, expand=["code"], nesting=["survey"], fill={"pct": 0.0})
    # 2 surveys × 2 code categories (BG, NULL)
    assert out.count() == 4


def test_multi_column_expand(spark):
    """Expand over the JOINT distinct of several columns (the pfg
    triple), not their full cross."""
    df = spark.createDataFrame(
        [
            Row(survey="s1", status="native", form="forb", rate=1.0),
            Row(survey="s1", status="nonnative", form="shrub", rate=2.0),
            Row(survey="s2", status="native", form="forb", rate=3.0),
        ]
    )
    out = complete(
        df, expand=["status", "form"], nesting=["survey"], fill={"rate": 0.0}
    )
    # 2 surveys × 2 OBSERVED (status,form) combos — not 2×2×2
    assert out.count() == 4
