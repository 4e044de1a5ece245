"""Sequence packing: chunk grid arithmetic, overlap reconstruction,
edge sizes, and the no-shuffle scale contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.chunking import pack_sequences


def _doc(spark, n_tokens: int):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([("d", text)], ["doc_id", "text"])


def test_short_doc_single_chunk(spark):
    out = pack_sequences(_doc(spark, 10), max_tokens=64, overlap=8).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0 and out[0].n_tokens == 10


def test_exact_budget_single_chunk(spark):
    out = pack_sequences(_doc(spark, 64), max_tokens=64, overlap=8).collect()
    assert len(out) == 1 and out[0].n_tokens == 64


def test_overlap_and_coverage(spark):
    rows = sorted(
        pack_sequences(_doc(spark, 150), max_tokens=64, overlap=8).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 56: chunks at 0,56,112 → 1 + ceil((150-64)/56) = 3
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert rows[0].n_tokens == 64 and rows[1].n_tokens == 64
    assert rows[2].n_tokens == 150 - 112
    c0, c1 = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert c0[-8:] == c1[:8]  # overlap region shared verbatim
    # every token covered exactly: union of chunks == original
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split())
    assert len(seen) == 150


def test_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        pack_sequences(_doc(spark, 10), max_tokens=8, overlap=8)


def test_packing_is_map_side_only(spark):
    df = _doc(spark, 200)
    plan = (
        pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
