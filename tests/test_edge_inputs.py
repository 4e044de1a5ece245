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
