"""Edge-input robustness: empty and degenerate frames must not crash
or corrupt semantics (empty season batch, no near-dups, single doc)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.complete import complete
from mpg_data_warehouse_spark.operators.append import new_only
from mpg_data_warehouse_spark.operators import dedup as D


def test_complete_empty_input(spark):
    df = spark.createDataFrame([], "k int, code string, m double")
    out = complete(df, expand=["code"], nesting=["k"], fill={"m": 0.0})
    assert out.count() == 0
    assert out.columns == ["k", "code", "m"]


def test_new_only_empty_batch(spark):
    existing = spark.createDataFrame([Row(k=1)])
    empty = spark.createDataFrame([], "k bigint")
    assert new_only(empty, existing, ["k"]).count() == 0


def test_dedup_single_doc_no_pairs(spark):
    one = spark.createDataFrame([Row(doc_id=1, text="only one document here")])
    assert D.minhash_dedup_pairs(one).count() == 0
    assert D.ngram_jaccard_pairs(one).count() == 0
    assert D.simhash_near_pairs(one).count() == 0


def test_retention_no_pairs_keeps_everything(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text=f"doc {i}") for i in range(5)])
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    kept = D.retain_representatives(docs, pairs)
    assert kept.count() == 5


def test_connected_components_empty_edges(spark):
    ids = spark.createDataFrame([Row(doc_id=i) for i in range(3)])
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    comp = {r.doc_id: r.component for r in D.connected_components(pairs, ids).collect()}
    assert comp == {0: 0, 1: 1, 2: 2}


def test_strip_boilerplate_empty_and_single(spark):
    from mpg_data_warehouse_spark.operators.text import strip_boilerplate_lines

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = strip_boilerplate_lines(empty, max_line_df=1)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "text", "n_lines_removed"}

    one = spark.createDataFrame([Row(doc_id=1, text="a\nb")])
    rows = strip_boilerplate_lines(one, max_line_df=5).collect()
    assert rows[0].text == "a\nb" and rows[0].n_lines_removed == 0


def test_repetition_signals_degenerate_docs(spark):
    from mpg_data_warehouse_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [Row(doc_id=1, text="one"), Row(doc_id=2, text="two words")]
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    # no bigrams in a 1-token doc -> left-join null filled with 0.0
    assert rows[1].top_bigram_frac == 0.0
    assert rows[2].top_bigram_frac == 1.0  # single bigram is 100% of mass


def test_asof_join_no_right_rows(spark):
    from mpg_data_warehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [Row(event_id=1, user_id=1, us=100)]
    )
    right = spark.createDataFrame([], "user_id bigint, us bigint, value double")
    out = asof_join(
        left, right, key="user_id", left_ts="us", right_ts="us",
        right_cols=["value"],
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].asof_value is None


def test_scd2_apply_empty_changes(spark):
    from mpg_data_warehouse_spark.operators.scd import scd2_apply, scd2_init

    cust = spark.createDataFrame(
        [Row(c_custkey=1, c_mktsegment="A", c_acctbal=1.0)]
    )
    dim = scd2_init(cust, "1995-01-01")
    empty = spark.createDataFrame(
        [], "c_custkey bigint, c_mktsegment string, c_acctbal double"
    )
    out = scd2_apply(
        dim, empty, "c_custkey", ["c_mktsegment", "c_acctbal"], "2000-06-15"
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].is_current


def test_semantic_dedup_single_vector(spark):
    from mpg_data_warehouse_spark.operators.similarity import (
        semantic_dedup_keep,
        semantic_dedup_pairs,
    )

    one = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0])]
    )
    assert semantic_dedup_pairs(one, n_centroids=2).count() == 0
    assert semantic_dedup_keep(one, n_centroids=2).count() == 1


def test_doc_logprob_score_empty_corpus(spark):
    from mpg_data_warehouse_spark.operators.text import (
        doc_logprob_score,
        unigram_lm,
    )

    train = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    model, oov = unigram_lm(train)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert doc_logprob_score(empty, model, oov).count() == 0


def test_key_skew_report_uniform_keys(spark):
    from mpg_data_warehouse_spark.operators.diagnostics import key_skew_report

    df = spark.createDataFrame([Row(k=f"k{i}", v=i) for i in range(10)])
    rep = key_skew_report(df, ["k"], top_n=5).collect()
    assert len(rep) == 5
    assert all(r.skew_ratio == 1.0 for r in rep)
