"""Persisted inverted index: build, OR/AND search, stopword damping,
and partition-filter pushdown on the term-bucket layout."""

import pytest
from pyspark.sql import Row

from mpg_data_warehouse_spark.operators.search import (
    build_inverted_index,
    search_terms,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha bravo charlie delta"),
            Row(doc_id=2, text="alpha bravo echo"),
            Row(doc_id=3, text="charlie delta foxtrot"),
            Row(doc_id=4, text="Alpha ALPHA alpha"),  # case + repeats
        ]
    )


def test_search_any_and_all(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_inverted_index(_docs(spark), idx)
    any_hits = {
        r.doc_id for r in search_terms(spark, idx, ["alpha", "charlie"]).collect()
    }
    assert any_hits == {1, 2, 3, 4}
    all_hits = {
        r.doc_id
        for r in search_terms(spark, idx, ["alpha", "charlie"], mode="all").collect()
    }
    assert all_hits == {1}
    # query terms normalize like the index (case-insensitive)
    assert {
        r.doc_id for r in search_terms(spark, idx, ["ALPHA"]).collect()
    } == {1, 2, 4}
    with pytest.raises(ValueError):
        search_terms(spark, idx, ["  "])
    with pytest.raises(ValueError):
        search_terms(spark, idx, ["x"], mode="fuzzy")


def test_max_df_drops_stopword_postings(spark, tmp_path):
    idx = str(tmp_path / "idx")
    # 'alpha' appears in 3 docs -> dropped at max_df=2
    build_inverted_index(_docs(spark), idx, max_df=2)
    assert search_terms(spark, idx, ["alpha"]).count() == 0
    assert {
        r.doc_id for r in search_terms(spark, idx, ["charlie"]).collect()
    } == {1, 3}


def test_search_scan_is_partition_pruned(spark, tmp_path):
    idx = str(tmp_path / "idx")
    build_inverted_index(_docs(spark), idx)
    plan = (
        search_terms(spark, idx, ["foxtrot"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bucket IN-list must reach the scan's PartitionFilters, so
    # non-matching bucket directories are never opened
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]


def test_phrase_query_tokenizes_like_the_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="machine learning systems"),
            Row(doc_id=2, text="machine tooling"),
            Row(doc_id=3, text="deep learning"),
        ]
    )
    build_inverted_index(docs, idx)
    # a phrase splits into its indexed terms instead of never matching
    assert {
        r.doc_id
        for r in search_terms(spark, idx, ["machine learning"]).collect()
    } == {1, 2, 3}
    assert {
        r.doc_id
        for r in search_terms(
            spark, idx, ["machine learning"], mode="all"
        ).collect()
    } == {1}
