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


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_complete_map_matches_grid_strategy(spark):
    """complete_map is a physical-shape change only: identical output
    to the grid-strategy complete() on the same frame, including
    explicit domains, multi-column expand, and missing anchors."""
    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [
            Row(survey="s1", status="native", form="forb", rate=1.0),
            Row(survey="s1", status="nonnative", form="shrub", rate=2.0),
            Row(survey="s2", status="native", form="forb", rate=3.0),
        ]
    )
    kw = dict(
        expand=["status", "form"], nesting=["survey"], fill={"rate": 0.0}
    )
    assert _rows_set(complete_map(df, **kw)) == _rows_set(complete(df, **kw))

    # explicit expand domain with never-observed combos + an anchor
    # set wider than the data (s3 gets an all-filled row per combo)
    dom = spark.createDataFrame(
        [
            Row(status="native", form="forb"),
            Row(status="nonnative", form="shrub"),
            Row(status="native", form="grass"),
        ]
    )
    anchors = spark.createDataFrame(
        [Row(survey=s) for s in ("s1", "s2", "s3")]
    )
    kw2 = dict(
        expand=["status", "form"],
        nesting=["survey"],
        fill={"rate": 0.0},
        expand_values=dom,
        nesting_values=anchors,
    )
    got = complete_map(df, **kw2)
    assert _rows_set(got) == _rows_set(complete(df, **kw2))
    assert got.count() == 9  # 3 anchors x 3 domain combos


def test_complete_map_null_category_kept(spark):
    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [
            Row(survey="s1", code=None, pct=1.0),
            Row(survey="s2", code="BG", pct=2.0),
        ]
    )
    kw = dict(expand=["code"], nesting=["survey"], fill={"pct": 0.0})
    assert _rows_set(complete_map(df, **kw)) == _rows_set(complete(df, **kw))


def test_complete_map_rejects_oversized_domain(spark):
    import pytest

    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [Row(survey="s", code=str(i), pct=1.0) for i in range(10)]
    )
    with pytest.raises(ValueError, match="max_domain"):
        complete_map(
            df, expand=["code"], nesting=["survey"], max_domain=5
        )


def test_complete_map_duplicate_pairs_fail_loudly(spark):
    """complete_map requires post-aggregation uniqueness; a duplicate
    (nesting, expand) pair must raise, not silently pick one."""
    import pytest

    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [
            Row(survey="s1", code="BG", pct=1.0),
            Row(survey="s1", code="BG", pct=2.0),
        ]
    )
    with pytest.raises(Exception, match="[Dd]uplicate"):
        complete_map(
            df, expand=["code"], nesting=["survey"]
        ).collect()


def test_null_category_row_keeps_its_value(spark):
    """dplyr/tidyr joins match NA keys: an existing (anchor, NULL)
    row keeps its measure instead of being silently filled (the bare
    equi-join never matched NULL and overwrote pct=1.0 with 0.0)."""
    df = spark.createDataFrame(
        [
            Row(survey="s1", code=None, pct=1.0),
            Row(survey="s2", code="BG", pct=2.0),
        ]
    )
    out = {
        (r.survey, r.code): r.pct
        for r in complete(
            df, expand=["code"], nesting=["survey"], fill={"pct": 0.0}
        ).collect()
    }
    assert out[("s1", None)] == 1.0
    assert out[("s2", None)] == 0.0
    assert out[("s1", "BG")] == 0.0
    assert out[("s2", "BG")] == 2.0


def test_complete_map_null_anchor_keeps_its_value(spark):
    """Null-safe anchor join: a NULL nesting key in nesting_values
    must pick up its data's measures, not the fill (the grid path's
    eqNullSafe semantics)."""
    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [
            Row(survey=None, code="BG", pct=2.0),
            Row(survey="s1", code="BG", pct=1.0),
        ]
    )
    anchors = spark.createDataFrame([Row(survey=None), Row(survey="s1")])
    kw = dict(
        expand=["code"],
        nesting=["survey"],
        fill={"pct": 0.0},
        nesting_values=anchors,
    )
    got = {
        (r.survey, r.code): r.pct for r in complete_map(df, **kw).collect()
    }
    assert got[(None, "BG")] == 2.0
    assert got[("s1", "BG")] == 1.0
    assert _rows_set(complete_map(df, **kw)) == _rows_set(complete(df, **kw))


def test_narrowed_expand_domain_raises_grid(spark):
    """An explicit expand_values NARROWER than the observed combos
    must fail loudly (tidyr keeps every observed row — a silent drop
    is data loss). The guard is lazy/in-plan: no extra job."""
    import pytest

    df = _base(spark)
    dom = spark.createDataFrame([Row(code="BG"), Row(code="L")])  # no WDT
    out = complete(
        df, expand=["code"], nesting=["survey", "grid"],
        fill={"pct": 0.0}, expand_values=dom,
    )
    with pytest.raises(Exception, match="outside the explicit"):
        out.collect()


def test_narrowed_expand_domain_raises_map(spark):
    import pytest

    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = _base(spark)
    dom = spark.createDataFrame([Row(code="BG"), Row(code="L")])
    out = complete_map(
        df, expand=["code"], nesting=["survey", "grid"],
        fill={"pct": 0.0}, expand_values=dom,
    )
    with pytest.raises(Exception, match="missing from expand_values"):
        out.collect()


def test_narrowed_anchor_set_raises_both(spark):
    import pytest

    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = _base(spark)
    anchors = spark.createDataFrame([Row(survey="s1", grid=1)])  # drops s2/s3
    for fn, pat in [
        (complete, "outside the explicit"),
        (complete_map, "outside the explicit nesting_values"),
    ]:
        out = fn(
            df, expand=["code"], nesting=["survey", "grid"],
            fill={"pct": 0.0}, nesting_values=anchors,
        )
        with pytest.raises(Exception, match=pat):
            out.collect()


def test_superset_domains_still_fill_and_match(spark):
    """Superset expand_values + superset nesting_values: both
    strategies stay output-identical and guards stay silent."""
    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = _base(spark)
    dom = spark.createDataFrame(
        [Row(code=c) for c in ["BG", "L", "WDT", "EXTRA"]]
    )
    anchors = spark.createDataFrame(
        [Row(survey=s, grid=g) for s, g in
         [("s1", 1), ("s2", 2), ("s3", 1), ("s9", 9)]]
    )
    kw = dict(
        expand=["code"], nesting=["survey", "grid"], fill={"pct": -1.0},
        expand_values=dom, nesting_values=anchors,
    )
    a = {tuple(r) for r in complete(df, **kw).collect()}
    b = {tuple(r) for r in complete_map(df, **kw).collect()}
    assert a == b
    assert len(a) == 4 * 4
    assert ("s9", 9, "EXTRA", -1.0) in a


def test_null_category_in_explicit_domain_guard_silent(spark):
    """A NULL expand category present in BOTH data and domain must not
    trip the strict guard (null-safe struct matching)."""
    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [Row(survey="s1", code=None, pct=5.0),
         Row(survey="s2", code="BG", pct=1.0)],
        schema="survey string, code string, pct double",
    )
    dom = spark.createDataFrame(
        [Row(code=None), Row(code="BG")], schema="code string"
    )
    kw = dict(expand=["code"], nesting=["survey"], fill={"pct": 0.0},
              expand_values=dom)
    a = {tuple(r) for r in complete(df, **kw).collect()}
    b = {tuple(r) for r in complete_map(df, **kw).collect()}
    assert a == b
    assert ("s1", None, 5.0) in a and ("s1", "BG", 0.0) in a
