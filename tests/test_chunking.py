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


# ---------------------------------------------------------------------------
# pack_paragraphs — boundary-aware greedy packing
# ---------------------------------------------------------------------------


def _para_doc(spark):
    paras = [
        " ".join(f"p1w{i}" for i in range(10)),   # 10 tokens
        " ".join(f"p2w{i}" for i in range(20)),   # 20 tokens
        " ".join(f"p3w{i}" for i in range(15)),   # 15 tokens
        " ".join(f"p4w{i}" for i in range(40)),   # 40 tokens (oversized)
        " ".join(f"p5w{i}" for i in range(5)),    # 5 tokens
    ]
    return spark.createDataFrame(
        [(1, "\n\n".join(paras))], ["doc_id", "text"]
    )


def test_pack_paragraphs_greedy_fill(spark):
    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    rows = sorted(
        pack_paragraphs(_para_doc(spark), max_tokens=32).collect(),
        key=lambda r: r.chunk_id,
    )
    # Greedy: [p1+p2]=30, [p3]=15 (p4 doesn't fit), [p4]=40 alone, [p5]=5
    assert [r.n_tokens for r in rows] == [30, 15, 40, 5]
    assert rows[0].chunk_text.startswith("p1w0") and "p2w19" in rows[0].chunk_text
    # paragraph boundary preserved as a blank line inside the chunk
    assert "\n\n" in rows[0].chunk_text
    # chunks never split a paragraph
    assert rows[2].chunk_text.split() == [f"p4w{i}" for i in range(40)]


def test_pack_paragraphs_oversized_paragraph_isolated(spark):
    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    rows = pack_paragraphs(_para_doc(spark), max_tokens=32).collect()
    over = [r for r in rows if r.n_tokens > 32]
    assert len(over) == 1 and over[0].n_tokens == 40


def test_pack_paragraphs_blank_doc_emits_nothing(spark):
    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    df = spark.createDataFrame(
        [(1, "  \n\n   \n\n"), (2, "one two three")], ["doc_id", "text"]
    )
    rows = pack_paragraphs(df, max_tokens=8).collect()
    assert {r.doc_id for r in rows} == {2}
    assert rows[0].chunk_text == "one two three"


def test_pack_paragraphs_is_map_side_only(spark):
    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    plan = (
        pack_paragraphs(_para_doc(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_paragraphs_crlf_and_whitespace_blank_lines(spark):
    """CRLF documents and blank lines containing spaces/tabs must
    still delimit paragraphs — '\\n{2,}' alone collapsed such docs
    into one oversized chunk, defeating the token budget."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    p1 = "one two three four"
    p2 = "five six seven eight"
    p3 = "nine ten eleven twelve"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{p1}\r\n\r\n{p2}\r\n\r\n{p3}"),
            Row(doc_id=2, text=f"{p1}\n  \n{p2}\n\t\n{p3}"),
            Row(doc_id=3, text=f"{p1}\n\n{p2}\n\n{p3}"),  # plain LF control
        ]
    )
    out = pack_paragraphs(docs, max_tokens=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.n_tokens)
    # 3 paragraphs of 4 tokens, budget 8 → two chunks (4+4, 4) per doc
    assert by_doc[1] == by_doc[2] == by_doc[3] == [8, 4]


def test_pack_sequences_rejects_negative_overlap(spark):
    import pytest
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.chunking import pack_sequences

    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError, match="overlap"):
        pack_sequences(df, max_tokens=4, overlap=-1)


def test_pack_paragraphs_quoted_column_name(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.chunking import pack_paragraphs

    df = spark.createDataFrame(
        [Row(doc_id=1, **{"raw text": "one two\n\nthree four"})]
    )
    out = pack_paragraphs(df, text_col="raw text", max_tokens=10).collect()
    assert out[0].chunk_text == "one two\n\nthree four"
    assert out[0].n_tokens == 4
