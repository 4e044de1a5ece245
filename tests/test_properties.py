"""Property-based tests (hypothesis) for the engine's custom
operators: invariants must hold for ARBITRARY inputs, not just the
fixtures — the reference's operational checks turned adversarial."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.append import new_only
from mpg_data_warehouse_spark.operators.complete import complete

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
codes = st.sampled_from(["a", "b", "c", "d"])
rows = st.lists(
    st.tuples(keys, codes, st.floats(0, 100, allow_nan=False)),
    min_size=1,
    max_size=40,
)


@_slow
@given(data=rows)
def test_complete_grid_cardinality_property(spark, data):
    """For any frame: |complete()| == |distinct anchors| × |distinct
    codes|, every original row survives, and no measure is NULL."""
    df = spark.createDataFrame(
        [Row(k=k, code=c, m=m) for k, c, m in data]
    ).dropDuplicates(["k", "code"])
    out = complete(df, expand=["code"], nesting=["k"], fill={"m": 0.0})
    n_k = df.select("k").distinct().count()
    n_c = df.select("code").distinct().count()
    assert out.count() == n_k * n_c
    assert out.filter(F.col("m").isNull()).count() == 0
    # original measures survive completion unchanged
    orig = {(r.k, r.code): r.m for r in df.collect()}
    got = {(r.k, r.code): r.m for r in out.collect()}
    for kk, vv in orig.items():
        assert got[kk] == vv


@_slow
@given(
    existing=st.lists(keys, min_size=0, max_size=15),
    batch=st.lists(keys, min_size=0, max_size=15),
)
def test_anti_join_partitions_batch_property(spark, existing, batch):
    """new_only(batch) ∪ already-present(batch) is a disjoint
    partition of the batch's distinct keys."""
    e = spark.createDataFrame([Row(k=k) for k in existing] or [Row(k=-1)])
    b = spark.createDataFrame([Row(k=k) for k in batch] or [Row(k=-1)])
    new = {r.k for r in new_only(b, e, ["k"]).collect()}
    eks = set(existing or [-1])
    bks = set(batch or [-1])
    assert new == bks - eks


@_slow
@given(data=st.lists(st.text("ab ", min_size=0, max_size=12), min_size=2, max_size=8))
def test_jaccard_bounds_and_symmetry_property(spark, data):
    """Exact n-gram Jaccard: every reported pair has 0 < j ≤ 1, and
    identical texts always score exactly 1.0."""
    from mpg_data_warehouse_spark.operators.dedup import ngram_jaccard_pairs

    docs = [Row(doc_id=i, text=t) for i, t in enumerate(data)]
    df = spark.createDataFrame(docs)
    pairs = ngram_jaccard_pairs(df, shingle_n=2, threshold=0.0).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    for (a, b), j in by_pair.items():
        assert a < b
        assert 0.0 < j <= 1.0
    for i, ti in enumerate(data):
        for k in range(i + 1, len(data)):
            if data[k] == ti:
                assert by_pair.get((i, k)) == 1.0


def test_group_quantiles_median_exact(spark):
    """Odd-count group: p50 must be the exact middle element; p25/p75
    interpolate (type-7), pinned against numpy."""
    import numpy as np

    from mpg_data_warehouse_spark.operators.aggregates import group_quantiles

    vals = [1.0, 5.0, 2.0, 9.0, 4.0]  # sorted: 1 2 4 5 9 → median 4
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    row = group_quantiles(df, ["g"], "v").first()
    assert row.p50 == 4.0
    assert row.p25 == round(float(np.percentile(vals, 25)), 4)
    assert row.p75 == round(float(np.percentile(vals, 75)), 4)


def test_pivot_counts_zero_fill_and_totals(spark):
    from mpg_data_warehouse_spark.operators.aggregates import pivot_counts

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")], ["k", "v"]
    )
    out = {r.k: r for r in pivot_counts(df, ["k"], "v", ["x", "y", "z"]).collect()}
    assert out["a"].n_x == 2 and out["a"].n_y == 1 and out["a"].n_z == 0
    assert out["b"].n_x == 0 and out["b"].n_y == 1
    # totals preserved
    assert sum(r.n_x + r.n_y + r.n_z for r in out.values()) == df.count()


def test_group_corr_stats_perfect_line(spark):
    from mpg_data_warehouse_spark.operators.aggregates import group_corr_stats

    df = spark.createDataFrame(
        [("g", float(i), 2.0 * i + 1) for i in range(10)], ["g", "x", "y"]
    )
    row = group_corr_stats(df, ["g"], "x", "y").first()
    assert row.corr_xy == 1.0
    # identity covar(x,2x+1) = 2·var(x); stddev is rounded to 6dp
    # before squaring, so allow the amplified rounding error
    assert abs(row.covar_xy - 2 * row.stddev_x**2) < 1e-4


def test_histogram_fixed_caps_and_counts(spark):
    from mpg_data_warehouse_spark.operators.aggregates import histogram_fixed

    df = spark.createDataFrame([(v,) for v in [0.0, 4.9, 5.0, 12.0, 999.0]], ["v"])
    out = {r.bucket: r.n for r in histogram_fixed(df, "v", 5.0, 3).collect()}
    assert out[0] == 2 and out[1] == 1 and out[2] == 1 and out[3] == 1  # capped


def test_jsonl_roundtrip_preserves_schema_and_rows(spark, tmp_path):
    from mpg_data_warehouse_spark.sources.readers import read_jsonl
    from mpg_data_warehouse_spark.sources.writers import write_jsonl

    from tests.conftest import SF_ORACLE

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(orders, path, partitions=2)
    back = read_jsonl(spark, path, orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_totalprice")).first()[0]
    b = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(a - b) < 1e-6


def test_approx_aggregates_within_tolerance(spark):
    """The 100 TB substitutes (approx_count_distinct / KLL
    percentile_approx) must land within their documented error of the
    exact answers they replace."""
    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact_d"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("approx_p50"),
    ).first()
    assert abs(row.approx_d - row.exact_d) / row.exact_d < 0.05
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 < 0.01


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcx ", min_size=1, max_size=12).map(str.strip).filter(bool),
            min_size=1,
            max_size=5,
        ).map("\n".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_strip_boilerplate_identity_when_threshold_above_corpus(spark, texts):
    """With max_line_df >= corpus size no line can be an outlier:
    strip_boilerplate_lines must return every document VERBATIM (the
    reassembly round-trip is lossless, order preserved)."""
    from mpg_data_warehouse_spark.operators.text import strip_boilerplate_lines

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = strip_boilerplate_lines(df, max_line_df=len(texts))
    got = {r.doc_id: (r.text, r.n_lines_removed) for r in out.collect()}
    assert got == {i: (t, 0) for i, t in enumerate(texts)}


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_value_is_deterministic_and_bounded(spark, pts):
    """zorder_value is a pure function of (value, bounds): stable
    across evaluations and within [0, 4^bits)."""
    from mpg_data_warehouse_spark.sources.writers import zorder_value

    df = spark.createDataFrame(pts, ["x", "y"])
    z = zorder_value(
        F.col("x").cast("double"), 0.0, 1000.0,
        F.col("y").cast("double"), 0.0, 1000.0, bits=8,
    )
    a = [r.z for r in df.select(z.alias("z")).orderBy("x", "y").collect()]
    b = [r.z for r in df.select(z.alias("z")).orderBy("x", "y").collect()]
    assert a == b
    assert all(0 <= v < (1 << 16) for v in a)


texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "zz9"]),
        min_size=1,
        max_size=12,
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@_slow
@given(docs=texts)
def test_unigram_scores_match_python_reference(spark, docs):
    """For any corpus: engine (term, logp) and per-doc NLL equal a
    pure-Python reference of the same smoothing formula."""
    import math
    from collections import Counter

    from mpg_data_warehouse_spark.operators.text import (
        doc_logprob_score,
        unigram_lm,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    model, oov = unigram_lm(df, alpha=0.5)

    counts = Counter(t for d in docs for t in d.split())
    total = sum(counts.values())
    denom = total + 0.5 * (len(counts) + 1)
    ref_logp = {t: round(math.log((n + 0.5) / denom), 6) for t, n in counts.items()}
    assert {r.term: r.logp for r in model.collect()} == ref_logp
    assert oov == round(math.log(0.5 / denom), 6)

    got = {r.doc_id: r.nll_per_token for r in doc_logprob_score(df, model, oov).collect()}
    for i, d in enumerate(docs):
        toks = d.split()
        want = -sum(ref_logp[t] for t in toks) / len(toks)
        assert abs(got[i] - want) < 1e-5


para_docs = st.lists(
    st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=1, max_size=9)
        .map(" ".join),
        min_size=1,
        max_size=6,
    ).map("\n\n".join),
    min_size=1,
    max_size=6,
)


@_slow
@given(docs=para_docs)
def test_pack_paragraphs_covers_exactly_in_order(spark, docs):
    """For any corpus: concatenating a doc's chunks in chunk order
    reproduces the doc's token stream exactly (no loss, no dup, no
    reorder), and only lone-oversized-paragraph chunks exceed the
    budget."""
    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    rows = pack_paragraphs(df, max_tokens=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        rebuilt = [tok for c in chunks for tok in c.chunk_text.split()]
        assert rebuilt == t.split()
        for c in chunks:
            # oversized ⇒ the chunk is a single paragraph
            if c.n_tokens > 8:
                assert "\n\n" not in c.chunk_text


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 500),
            st.sampled_from(["a", "b", "c"]),
            st.integers(1, 30),
        ),
        min_size=1,
        max_size=40,
    ),
    temp=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
)
def test_temperature_sample_is_subset_and_deterministic(spark, rows, temp):
    """For any corpus and temperature: output ⊆ input, and two runs
    agree row for row."""
    from mpg_data_warehouse_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    df = spark.createDataFrame(
        [Row(doc_id=k, source=s, w=w) for k, s, w in rows]
    ).dropDuplicates(["doc_id"])
    out1 = temperature_mixture_sample(df, "source", "doc_id", "w", temp, 50.0)
    out2 = temperature_mixture_sample(df, "source", "doc_id", "w", temp, 50.0)
    ids_all = {r.doc_id for r in df.collect()}
    ids1 = {r.doc_id for r in out1.collect()}
    assert ids1 <= ids_all
    assert ids1 == {r.doc_id for r in out2.collect()}


# --- round-4 operators ---

texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=80,
)


@_slow
@given(data=st.lists(texts, min_size=1, max_size=12))
def test_normalize_text_idempotent_property(spark, data):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode —
    a second pass must never change the output (stability under
    re-ingest)."""
    from mpg_data_warehouse_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(data)]
    )
    once = normalize_text(df)
    twice = normalize_text(once)
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b


@_slow
@given(
    data=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_table_diff_properties(spark, data):
    """diff(x, x) is empty; diff(x, y) key-partitions into the exact
    set differences and value mismatches for arbitrary tables."""
    from mpg_data_warehouse_spark.operators.versioned import table_diff

    old = spark.createDataFrame([Row(k=k, v=v) for k, v in data])
    assert table_diff(old, old, ["k"]).count() == 0

    # mutate: drop even keys, bump values on k % 3 == 0, add new key
    new_rows = [
        Row(k=k, v=v + (1 if k % 3 == 0 else 0))
        for k, v in data
        if k % 2 == 1
    ] + [Row(k=999, v=0)]
    new = spark.createDataFrame(new_rows)
    got = {r.k: r.change for r in table_diff(old, new, ["k"]).collect()}
    old_keys = {k for k, _ in data}
    assert got.get(999) == "added"
    for k, v in data:
        if k % 2 == 0:
            assert got[k] == "removed"
        elif k % 3 == 0:
            assert got[k] == "changed"
        else:
            assert k not in got


_null_codes = st.sampled_from(["a", "b", "c", None])
_dedup_rows = st.lists(
    st.tuples(keys, _null_codes, st.floats(0, 100, allow_nan=False)),
    min_size=1,
    max_size=40,
).map(lambda rs: list({(k, c): (k, c, v) for k, c, v in rs}.values()))


@_slow
@given(data=_dedup_rows)
def test_complete_map_equals_grid_for_arbitrary_frames(spark, data):
    """The two completion strategies are output-identical for ANY
    post-aggregation frame — including NULL expand categories and
    NULL-bearing measures — with and without an explicit wider
    anchor set."""
    from mpg_data_warehouse_spark.operators.complete import complete_map

    df = spark.createDataFrame(
        [Row(survey=k, code=c, pct=v) for k, c, v in data],
        schema="survey long, code string, pct double",
    )
    kw = dict(expand=["code"], nesting=["survey"], fill={"pct": -1.0})
    grid = {tuple(r) for r in complete(df, **kw).collect()}
    mapped = {tuple(r) for r in complete_map(df, **kw).collect()}
    assert mapped == grid

    anchors = spark.createDataFrame(
        [Row(survey=k) for k in range(7)],  # superset of observed keys
        schema="survey long",
    )
    kw2 = dict(
        expand=["code"],
        nesting=["survey"],
        fill={"pct": -1.0},
        nesting_values=anchors,
    )
    grid2 = {tuple(r) for r in complete(df, **kw2).collect()}
    mapped2 = {tuple(r) for r in complete_map(df, **kw2).collect()}
    assert mapped2 == grid2


@_slow
@given(
    corpus=st.lists(
        st.text("abcde ", min_size=0, max_size=30), min_size=1, max_size=12
    ),
    query=st.text("abcde ", min_size=1, max_size=12),
)
def test_bm25_never_negative_and_only_matching_docs(spark, tmp_path_factory, corpus, query):
    """BM25 invariants for arbitrary corpora/queries: scores are
    positive, only docs containing ≥1 query term appear, and ranks
    are a 1..n permutation per query."""
    from mpg_data_warehouse_spark.operators.search import (
        bm25_search_many,
        build_ranked_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    idx = str(tmp_path_factory.mktemp("ridx"))
    build_ranked_index(docs, idx)
    qterms = {w for w in query.lower().split() if w}
    if not qterms:
        return
    rows = bm25_search_many(spark, idx, [query], k=50).collect()
    toks = {i: set(t.lower().split()) for i, t in enumerate(corpus)}
    expected = {i for i, ts in toks.items() if ts & qterms}
    assert {r.doc_id for r in rows} == expected
    assert all(r.score > 0 for r in rows)
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))


def test_string_agg_ordered_limited_null_values_excluded(spark):
    """STRING_AGG parity (r10 ADVICE): NULL values must not consume a
    ranked slot. A null-v struct sorts FIRST ascending, so before the
    fix a group with nulls emitted fewer than ``limit`` values while
    DuckDB/BigQuery STRING_AGG ... LIMIT n returns n non-null ones."""
    from mpg_data_warehouse_spark.operators.aggregates import (
        string_agg_ordered_limited,
    )

    df = spark.createDataFrame(
        [Row(g="a", v=v) for v in [None, None, 3, 1, 2, 10]]
        + [Row(g="b", v=None)],
        "g string, v int",
    )
    got = {
        r.g: r.top
        for r in string_agg_ordered_limited(
            df, ["g"], "v", 3, "top"
        ).collect()
    }
    # nulls skipped, numeric order (2 before 10), exactly 3 slots used
    assert got["a"] == "1,2,3"
    # an all-null group aggregates to the empty string, not a crash
    assert got["b"] == ""


def test_string_agg_bounded_topk_keeps_duplicates(spark):
    """r12 (VERDICT r11 finding 1): the two-level bounded top-k must
    return the exact smallest-k MULTISET — duplicate values landing in
    different input partitions each keep their slot, identical to the
    old whole-group sort. Partitioning is forced wide so every value
    lands alone in a partition (the adversarial layout for a local
    pre-reduce)."""
    from mpg_data_warehouse_spark.operators.aggregates import (
        string_agg_ordered_limited,
    )

    rows = [Row(g="a", v=v) for v in [5, 1, 2, 1, 9, 1]] + [
        Row(g="b", v=v) for v in [7, 7]
    ]
    df = spark.createDataFrame(rows, "g string, v int").repartition(8)
    got = {
        r.g: r.top
        for r in string_agg_ordered_limited(
            df, ["g"], "v", 3, "top"
        ).collect()
    }
    # all three 1s are distinct rows: duplicates fill the k slots
    assert got["a"] == "1,1,1"
    # fewer than k values: emit what exists, no padding
    assert got["b"] == "7,7"


def test_string_agg_bounded_matches_whole_group_sort(spark):
    """Equivalence pin: across several partition layouts the bounded
    operator equals the naive whole-group ``sorted(values)[:k]``."""
    import random

    from mpg_data_warehouse_spark.operators.aggregates import (
        string_agg_ordered_limited,
    )

    rng = random.Random(12)
    rows = [
        Row(g=f"g{rng.randrange(3)}", v=rng.randrange(20))
        for _ in range(200)
    ]
    expected: dict[str, list[int]] = {}
    for r in rows:
        expected.setdefault(r.g, []).append(r.v)
    want = {
        g: ",".join(str(v) for v in sorted(vs)[:4])
        for g, vs in expected.items()
    }
    base = spark.createDataFrame(rows, "g string, v int")
    for parts in (1, 7, 32):
        got = {
            r.g: r.top
            for r in string_agg_ordered_limited(
                base.repartition(parts), ["g"], "v", 4, "top"
            ).collect()
        }
        assert got == want, f"diverged at repartition({parts})"
