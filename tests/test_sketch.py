"""HLL register sketches: bit-exact agreement with a pure-Python
reference (same md5 algebra the DuckDB oracles replay), merge ≡
direct-build, and estimator accuracy."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.sketch import (
    hll_estimate,
    hll_merge,
    hll_sketch,
    hll_union,
    hll_zero_regs,
)


# --- pure-Python reference: the exact algebra sketch.py implements ---


def _py_registers(values, p=8):
    m = 1 << p
    w = 64 - p
    regs = [0] * m
    for v in values:
        if v is None:
            continue
        hx = hashlib.md5(str(v).encode()).hexdigest()
        hi = int(hx[:8], 16)
        lo = int(hx[8:16], 16)
        bucket = hi >> (32 - p)
        rest = (hi - (bucket << (32 - p))) * (1 << 32) + lo
        rho = (w + 1) - rest.bit_length()  # bit_length(0) == 0
        regs[bucket] = max(regs[bucket], rho)
    return regs


def _py_estimate(regs, p=8, decimals=4):
    m = 1 << p
    w = 64 - p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    t = sum(1 << ((w + 1) - r) for r in regs)
    raw = alpha * m * m * float(1 << (w + 1)) / float(t)
    v = regs.count(0)
    est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    return round(est, decimals)


def _values(n, tag="v"):
    return [f"{tag}-{i}" for i in range(n)]


def test_registers_match_python_reference(spark):
    vals = _values(500) + [None, "dup", "dup"]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, val string"
    )
    got = hll_sketch(df, ["grp"], "val").collect()
    assert len(got) == 1
    assert list(got[0]["hll_registers"]) == _py_registers(vals)


def test_estimate_matches_python_reference(spark):
    for n in (3, 40, 2000):  # linear-counting AND raw regimes
        vals = _values(n)
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, val string"
        )
        got = (
            hll_sketch(df, ["grp"], "val")
            .select(hll_estimate(F.col("hll_registers")).alias("e"))
            .first()["e"]
        )
        assert got == pytest.approx(
            _py_estimate(_py_registers(vals)), abs=1e-4
        )


def test_merge_equals_direct_build(spark):
    a, b = _values(300, "a"), _values(300, "b")
    both = spark.createDataFrame(
        [("g", v) for v in a + b], "grp string, val string"
    )
    parts = spark.createDataFrame(
        [("g", "pa", v) for v in a] + [("g", "pb", v) for v in b],
        "grp string, part string, val string",
    )
    direct = hll_sketch(both, ["grp"], "val").first()["hll_registers"]
    per_part = hll_sketch(parts, ["grp", "part"], "val")
    merged = hll_merge(per_part.drop("part"), ["grp"]).first()[
        "hll_registers"
    ]
    assert list(merged) == list(direct)


def test_union_column_equals_merge(spark):
    a, b = _values(120, "x"), _values(120, "y")
    sa = hll_sketch(
        spark.createDataFrame([("g", v) for v in a], "grp string, val string"),
        ["grp"], "val", out_col="ra",
    )
    sb = hll_sketch(
        spark.createDataFrame([("g", v) for v in b], "grp string, val string"),
        ["grp"], "val", out_col="rb",
    )
    got = (
        sa.join(sb, "grp")
        .select(hll_union(F.col("ra"), F.col("rb")).alias("u"))
        .first()["u"]
    )
    assert list(got) == _py_registers(a + b)


def test_all_null_group_absent_and_nulls_skipped(spark):
    df = spark.createDataFrame(
        [("live", "v1"), ("live", None), ("dead", None)],
        "grp string, val string",
    )
    rows = {r["grp"]: r for r in hll_sketch(df, ["grp"], "val").collect()}
    assert set(rows) == {"live"}
    assert list(rows["live"]["hll_registers"]) == _py_registers(["v1"])


def test_estimate_accuracy_and_zero_regs(spark):
    vals = _values(5000)
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, val string"
    )
    row = (
        hll_sketch(df, ["grp"], "val")
        .select(
            hll_estimate(F.col("hll_registers")).alias("e"),
            hll_zero_regs(F.col("hll_registers")).alias("v"),
        )
        .first()
    )
    assert abs(row["e"] - 5000) / 5000 < 0.15  # ~1.04/sqrt(256) typical
    assert row["v"] == _py_registers(vals).count(0)


def test_small_p_estimates_do_not_overflow_pow2_table(spark):
    # regression: p in {6, 7} used to index past the 58-entry pow2
    # table (empty register rho=0 needs element w+2) and crash
    for p in (6, 7):
        vals = _values(200, f"p{p}")
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, val string"
        )
        sk = hll_sketch(df, ["grp"], "val", p=p)
        row = sk.select(
            hll_estimate(F.col("hll_registers"), p=p).alias("e")
        ).first()
        assert list(sk.first()["hll_registers"]) == _py_registers(vals, p)
        assert row["e"] is not None and row["e"] > 0


def test_merge_keeps_all_zero_sketch_group(spark):
    # regression: a group whose every input sketch is empty must emit
    # the all-zero sketch, not vanish from the merged output
    m = 256
    live = _py_registers(_values(50))
    df = spark.createDataFrame(
        [("dead", [0] * m), ("live", live), ("live", [0] * m)],
        "grp string, hll_registers array<int>",
    )
    rows = {r["grp"]: r for r in hll_merge(df, ["grp"]).collect()}
    assert set(rows) == {"dead", "live"}
    assert list(rows["dead"]["hll_registers"]) == [0] * m
    assert list(rows["live"]["hll_registers"]) == live
    est = (
        hll_merge(df, ["grp"])
        .select("grp", hll_estimate(F.col("hll_registers")).alias("e"))
        .collect()
    )
    assert {r["grp"]: r["e"] for r in est}["dead"] == 0.0


def test_sketch_parquet_roundtrip_and_cross_table_merge(spark, tmp_path):
    # the "at rest it is plain parquet" claim: persist per-source
    # sketches, read them back, merge across sources — equal to a
    # direct sketch over the union (the incremental-profile pattern:
    # only the new source's rows are ever re-scanned)
    a, b = _values(200, "s1"), _values(150, "s2")
    for tag, vals in (("s1", a), ("s2", b)):
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, val string"
        )
        hll_sketch(df, ["grp"], "val").write.mode("overwrite").parquet(
            str(tmp_path / tag)
        )
    stored = spark.read.parquet(str(tmp_path / "s1")).unionByName(
        spark.read.parquet(str(tmp_path / "s2"))
    )
    merged = hll_merge(stored, ["grp"]).first()["hll_registers"]
    assert list(merged) == _py_registers(a + b)


def test_p_bounds_rejected(spark):
    df = spark.createDataFrame([("g", "v")], "grp string, val string")
    for bad in (4, 17):
        with pytest.raises(ValueError):
            hll_sketch(df, ["grp"], "val", p=bad)


# --- Count-Min frequency sketch ---


def _py_cms(values, width=1024, depth=4, weights=None):
    counters = [0] * (width * depth)
    ws = weights or [1] * len(values)
    for v, w in zip(values, ws):
        if v is None:
            continue
        for d in range(depth):
            hx = hashlib.md5(f"cms{d}|{v}".encode()).hexdigest()
            counters[d * width + int(hx[:8], 16) % width] += w
    return counters


def _py_cms_query(counters, v, width=1024, depth=4):
    return min(
        counters[d * width + int(hashlib.md5(f"cms{d}|{v}".encode()).hexdigest()[:8], 16) % width]
        for d in range(depth)
    )


def test_cms_counters_match_python_reference(spark):
    from mpg_data_warehouse_spark.operators.sketch import cms_sketch

    vals = [f"t-{i % 40}" for i in range(500)] + [None]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, val string"
    )
    got = cms_sketch(df, ["grp"], "val").first()["cms_counters"]
    assert list(got) == _py_cms(vals)


def test_cms_query_upper_bounds_and_exact_counts(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        cms_query,
        cms_sketch,
    )

    vals = [f"t-{i % 40}" for i in range(500)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, val string"
    )
    sk = cms_sketch(df, ["grp"], "val")
    probes = spark.createDataFrame(
        [(f"t-{i}",) for i in range(40)] + [("absent",)], "term string"
    )
    got = (
        sk.crossJoin(probes)
        .select(
            "term",
            cms_query(F.col("cms_counters"), F.col("term")).alias("est"),
        )
        .collect()
    )
    counters = _py_cms(vals)
    true = {f"t-{i}": (500 + 39 - i) // 40 for i in range(40)}
    true["absent"] = 0
    for r in got:
        assert r["est"] >= true[r["term"]]  # CMS never undercounts
        assert r["est"] == _py_cms_query(counters, r["term"])


def test_cms_merge_and_union_equal_direct(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        cms_merge,
        cms_sketch,
        cms_union,
    )

    a = [f"a-{i % 11}" for i in range(120)]
    b = [f"b-{i % 7}" for i in range(90)]
    parts = spark.createDataFrame(
        [("g", "p1", v) for v in a] + [("g", "p2", v) for v in b],
        "grp string, part string, val string",
    )
    direct = _py_cms(a + b)
    merged = cms_merge(
        cms_sketch(parts, ["grp", "part"], "val").drop("part"), ["grp"]
    ).first()["cms_counters"]
    assert list(merged) == direct
    sa = cms_sketch(
        spark.createDataFrame([("g", v) for v in a], "grp string, val string"),
        ["grp"], "val", out_col="ca",
    )
    sb = cms_sketch(
        spark.createDataFrame([("g", v) for v in b], "grp string, val string"),
        ["grp"], "val", out_col="cb",
    )
    u = (
        sa.join(sb, "grp")
        .select(cms_union(F.col("ca"), F.col("cb")).alias("u"))
        .first()["u"]
    )
    assert list(u) == direct


def test_cms_weighted_build(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        cms_query,
        cms_sketch,
    )

    rows = [("g", "x", 5), ("g", "x", 2), ("g", "y", 10)]
    df = spark.createDataFrame(rows, "grp string, val string, w long")
    sk = cms_sketch(df, ["grp"], "val", weight_col="w")
    got = {
        r["v"]: r["est"]
        for r in sk.crossJoin(
            spark.createDataFrame([("x",), ("y",)], "v string")
        )
        .select("v", cms_query(F.col("cms_counters"), F.col("v")).alias("est"))
        .collect()
    }
    assert got == {"x": 7, "y": 10}


def test_cms_global_sketch_empty_keys(spark):
    from mpg_data_warehouse_spark.operators.sketch import cms_sketch

    df = spark.createDataFrame(
        [(v,) for v in ("a", "b", "a")], "val string"
    )
    rows = cms_sketch(df, [], "val").collect()
    assert len(rows) == 1
    assert list(rows[0]["cms_counters"]) == _py_cms(["a", "b", "a"])


def test_cms_param_bounds(spark):
    from mpg_data_warehouse_spark.operators.sketch import cms_sketch

    df = spark.createDataFrame([("g", "v")], "grp string, val string")
    for kw in ({"width": 8}, {"depth": 0}, {"depth": 9}):
        with pytest.raises(ValueError):
            cms_sketch(df, ["grp"], "val", **kw)


# --- KMV / bottom-k (theta) distinct sketch ---


def _kmv_df(spark, vals, key="g"):
    return spark.createDataFrame(
        [(key, v) for v in vals], ["g", "v"]
    )


def test_kmv_sketch_matches_python_reference(spark):
    from mpg_data_warehouse_spark.operators.sketch import kmv_sketch, py_kmv

    vals = _values(300) + [None, "dup", "dup"]
    got = kmv_sketch(_kmv_df(spark, vals), ["g"], "v").collect()
    assert len(got) == 1
    assert list(got[0]["kmv_minima"]) == py_kmv(vals)


def test_kmv_exact_branch_under_k(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    vals = _values(20)
    sk = kmv_sketch(_kmv_df(spark, vals), ["g"], "v")
    row = sk.select(
        F.size("kmv_minima").alias("n"),
        kmv_estimate(F.col("kmv_minima")).alias("est"),
    ).collect()[0]
    assert row["n"] == 20 and row["est"] == 20.0


def test_kmv_estimator_accuracy(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
        py_kmv,
        py_kmv_estimate,
    )

    vals = _values(5000)
    sk = kmv_sketch(_kmv_df(spark, vals), ["g"], "v")
    est = sk.select(kmv_estimate(F.col("kmv_minima")).alias("e")).collect()[
        0
    ]["e"]
    assert est == py_kmv_estimate(py_kmv(vals))
    assert abs(est - 5000) / 5000 < 0.35  # 1/sqrt(64) ≈ 12.5% std err


def test_kmv_merge_equals_direct_build(spark):
    from mpg_data_warehouse_spark.operators.sketch import kmv_merge, kmv_sketch

    a, b = _values(200, "a"), _values(150, "b")
    parts = kmv_sketch(
        _kmv_df(spark, a).unionByName(_kmv_df(spark, b, key="g2")).withColumn(
            "part", F.col("g")
        ),
        ["g"],
        "v",
    )
    # direct: one build over everything, grouped to ONE key
    direct = kmv_sketch(
        _kmv_df(spark, a + b).withColumn("g", F.lit("all")), ["g"], "v"
    ).collect()[0]["kmv_minima"]
    merged = kmv_merge(
        parts.withColumn("g", F.lit("all")), ["g"]
    ).collect()[0]["kmv_minima"]
    assert list(merged) == list(direct)


def test_kmv_union_column_equals_merge(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        kmv_sketch,
        kmv_union,
        py_kmv,
    )

    a, b = _values(100, "a"), _values(90, "b") + _values(10, "a")
    sa = kmv_sketch(_kmv_df(spark, a), ["g"], "v").withColumnRenamed(
        "kmv_minima", "sa"
    )
    sb = kmv_sketch(_kmv_df(spark, b), ["g"], "v").withColumnRenamed(
        "kmv_minima", "sb"
    )
    got = (
        sa.join(sb, "g")
        .select(kmv_union(F.col("sa"), F.col("sb")).alias("u"))
        .collect()[0]["u"]
    )
    assert list(got) == py_kmv(a + b)


def test_kmv_intersect_exact_and_estimated(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        kmv_intersect_estimate,
        kmv_sketch,
        py_kmv,
        py_kmv_intersect_estimate,
    )

    # exact branch: both sides under k distinct
    a, b = _values(30, "x"), _values(20, "x") + _values(25, "y")
    sa = kmv_sketch(_kmv_df(spark, a), ["g"], "v").withColumnRenamed(
        "kmv_minima", "sa"
    )
    sb = kmv_sketch(_kmv_df(spark, b), ["g"], "v").withColumnRenamed(
        "kmv_minima", "sb"
    )
    got = (
        sa.join(sb, "g")
        .select(
            kmv_intersect_estimate(F.col("sa"), F.col("sb")).alias("i")
        )
        .collect()[0]["i"]
    )
    assert got == 20.0  # exact overlap when neither sketch is full
    # estimator branch: shared 1000, each side +1500 unique
    shared = _values(1000, "s")
    a2, b2 = shared + _values(1500, "p"), shared + _values(1500, "q")
    sa2 = kmv_sketch(_kmv_df(spark, a2), ["g"], "v").withColumnRenamed(
        "kmv_minima", "sa"
    )
    sb2 = kmv_sketch(_kmv_df(spark, b2), ["g"], "v").withColumnRenamed(
        "kmv_minima", "sb"
    )
    got2 = (
        sa2.join(sb2, "g")
        .select(
            kmv_intersect_estimate(F.col("sa"), F.col("sb")).alias("i")
        )
        .collect()[0]["i"]
    )
    assert got2 == py_kmv_intersect_estimate(py_kmv(a2), py_kmv(b2))
    assert abs(got2 - 1000) / 1000 < 0.6  # intersection error compounds


def test_kmv_merge_keeps_all_empty_group(spark):
    from mpg_data_warehouse_spark.operators.sketch import kmv_merge

    df = spark.createDataFrame(
        [("g1", [1, 5, 9]), ("g1", [3, 5]), ("g2", []), ("g2", [])],
        "g string, kmv_minima array<long>",
    )
    got = {r["g"]: list(r["kmv_minima"]) for r in kmv_merge(df, ["g"]).collect()}
    assert got == {"g1": [1, 3, 5, 9], "g2": []}


def test_kmv_all_null_group_absent(spark):
    from mpg_data_warehouse_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", None)], ["g", "v"]
    )
    got = {r["g"] for r in kmv_sketch(df, ["g"], "v").collect()}
    assert got == {"a"}


def test_kmv_k_bounds_rejected(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    df = _kmv_df(spark, ["x"])
    with pytest.raises(ValueError):
        kmv_sketch(df, ["g"], "v", k=4)
    with pytest.raises(ValueError):
        kmv_estimate(F.col("c"), k=1 << 17)


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch (the mergeable order-statistics member).
# ---------------------------------------------------------------------------


def _qs_rows(spark, n=500, types=("a", "b")):
    from pyspark.sql import Row

    rows = [
        Row(grp=t, rid=i, val=float((i * 37) % 101))
        for t in types
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_quantile_sketch_matches_python_reference(spark):
    from mpg_data_warehouse_spark.operators.sketch import (
        py_qs_update,
        quantile_sketch,
    )

    df = _qs_rows(spark, n=500)
    got = {
        r.grp: [(s["h"], s["v"]) for s in r.qs_sample]
        for r in quantile_sketch(df, ["grp"], "val", ["rid"], k=64).collect()
    }
    for t in ("a", "b"):
        want = py_qs_update(
            [], [(str(i), float((i * 37) % 101)) for i in range(500)], k=64
        )
        assert got[t] == want, t


def test_quantile_exact_under_k(spark):
    """A group with ≤ k rows keeps every row: the estimate IS the
    true lower order statistic for every q."""
    from mpg_data_warehouse_spark.operators.sketch import (
        quantile_estimate,
        quantile_sketch,
    )

    df = _qs_rows(spark, n=50, types=("a",))
    sk = quantile_sketch(df, ["grp"], "val", ["rid"], k=256)
    vals = sorted(float((i * 37) % 101) for i in range(50))
    row = sk.select(
        *[
            quantile_estimate(F.col("qs_sample"), q).alias(f"q{int(q*100)}")
            for q in (0.0, 0.25, 0.5, 0.75, 1.0)
        ]
    ).first()
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        assert row[f"q{int(q*100)}"] == vals[int(q * 49)], q


def test_quantile_merge_equals_direct_build(spark):
    """Sketches built at a finer grain merge to EXACTLY the sketch a
    direct build over the union produces (hash order is a property of
    the rows, not the grouping) — the hour→day re-aggregation
    property."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.sketch import (
        quantile_merge,
        quantile_sketch,
    )

    df = _qs_rows(spark, n=400).withColumn(
        "sub", (F.col("rid") % 4).cast("int")
    )
    fine = quantile_sketch(df, ["grp", "sub"], "val", ["rid"], k=64)
    merged = {
        r.grp: [(s["h"], s["v"]) for s in r.qs_sample]
        for r in quantile_merge(fine.drop("sub"), ["grp"], k=64).collect()
    }
    direct = {
        r.grp: [(s["h"], s["v"]) for s in r.qs_sample]
        for r in quantile_sketch(df, ["grp"], "val", ["rid"], k=64).collect()
    }
    assert merged == direct


def test_quantile_nulls_skipped_and_all_null_group_absent(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sketch import quantile_sketch

    df = spark.createDataFrame(
        [Row(grp="a", rid=1, val=1.0), Row(grp="a", rid=2, val=None),
         Row(grp="b", rid=3, val=None)]
    )
    got = quantile_sketch(df, ["grp"], "val", ["rid"], k=64).collect()
    assert {r.grp for r in got} == {"a"}
    assert len(got[0].qs_sample) == 1


def test_quantile_nan_skipped_batch_matches_python_twin(spark):
    """NaN values must be skipped by the BATCH build exactly as
    py_qs_update (the streaming twin's state update) skips them —
    otherwise the bit-identical batch↔stream contract breaks on NaN
    inputs (r9 ADVICE finding)."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sketch import (
        py_qs_update,
        quantile_sketch,
    )

    rows = [
        Row(grp="a", rid=1, val=1.0),
        Row(grp="a", rid=2, val=float("nan")),
        Row(grp="a", rid=3, val=2.5),
        Row(grp="b", rid=4, val=float("nan")),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.grp: [(s["h"], s["v"]) for s in r.qs_sample]
        for r in quantile_sketch(df, ["grp"], "val", ["rid"], k=64).collect()
    }
    # group b is all-NaN → no row, matching the all-null rule
    assert set(got) == {"a"}
    want = py_qs_update(
        [], [(str(r.rid), r.val) for r in rows if r.grp == "a"], k=64
    )
    assert got["a"] == want
    assert len(got["a"]) == 2  # the NaN row was dropped


def test_quantile_estimate_bounds_and_k_bounds(spark):
    import pytest

    from mpg_data_warehouse_spark.operators.sketch import (
        quantile_estimate,
        quantile_sketch,
    )

    with pytest.raises(ValueError, match="q="):
        quantile_estimate(F.lit(None), 1.5)
    with pytest.raises(ValueError, match="k="):
        quantile_sketch(_qs_rows(spark, 5), ["grp"], "val", ["rid"], k=4)


def test_quantile_sample_estimate_near_truth(spark):
    """Statistical sanity (not a determinism pin): the k=256 sample
    median of 5000 uniform-ish values lands within a few percentiles
    of the true median."""
    from mpg_data_warehouse_spark.operators.sketch import (
        quantile_estimate,
        quantile_sketch,
    )

    df = _qs_rows(spark, n=5000, types=("a",))
    est = (
        quantile_sketch(df, ["grp"], "val", ["rid"], k=256)
        .select(quantile_estimate(F.col("qs_sample"), 0.5).alias("m"))
        .first()["m"]
    )
    vals = sorted(float((i * 37) % 101) for i in range(5000))
    true_med = vals[len(vals) // 2]
    # 101 distinct values; allow ±10 value-units (~±10 percentiles)
    assert abs(est - true_med) <= 10.0


def test_quantile_null_id_components_skipped_not_collapsed(spark):
    """r9 review: concat_ws would silently SKIP null id components,
    colliding distinct id tuples like (1, NULL) and (NULL, 1) onto one
    hash — the null-propagating join instead drops null-id rows on
    both engines."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.sketch import quantile_sketch

    df = spark.createDataFrame(
        [
            Row(grp="a", i1=1, i2=None, val=10.0),
            Row(grp="a", i1=None, i2=1, val=20.0),
            Row(grp="a", i1=1, i2=2, val=30.0),
        ]
    )
    got = quantile_sketch(df, ["grp"], "val", ["i1", "i2"], k=64).collect()
    assert len(got) == 1
    # only the fully-identified row enters the sample
    assert [s["v"] for s in got[0].qs_sample] == [30.0]


def test_quantile_estimate_empty_sketch_is_null(spark):
    """The empty-array rows quantile_merge preserves estimate as
    NULL, mirroring py_qs_estimate's None — not element_at(_, 0)."""
    from mpg_data_warehouse_spark.operators.sketch import (
        py_qs_estimate,
        quantile_estimate,
    )

    row = spark.sql(
        "SELECT array() AS e"
    ).select(
        quantile_estimate(
            F.expr("CAST(e AS array<struct<h: bigint, v: double>>)"), 0.5
        ).alias("m")
    ).first()
    assert row["m"] is None
    assert py_qs_estimate([], 0.5) is None
