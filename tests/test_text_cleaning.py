"""Line-level boilerplate removal + repetition signals (the C4/Dolma
cleaning-pass family) and the ORC source/sink round-trip."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.text import (
    duplicate_line_fraction,
    line_doc_frequencies,
    repetition_signals,
    strip_boilerplate_lines,
)

BOILER = "all rights reserved"


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=f"alpha beta\n{BOILER}\ngamma"),
            Row(doc_id=2, text=f"delta\n{BOILER}\nepsilon zeta"),
            Row(doc_id=3, text=f"eta theta\n{BOILER}"),
            Row(doc_id=4, text="unique document\nno boilerplate here"),
        ]
    )


def test_line_doc_frequencies_counts_distinct_docs(spark):
    freqs = {
        r.line: r.line_df
        for r in line_doc_frequencies(_docs(spark)).collect()
    }
    assert freqs[BOILER] == 3
    assert freqs["delta"] == 1


def test_strip_boilerplate_removes_frequent_lines_preserves_order(spark):
    out = strip_boilerplate_lines(_docs(spark), max_line_df=2)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].text == "alpha beta\ngamma"  # order preserved
    assert rows[1].n_lines_removed == 1
    assert rows[4].text == "unique document\nno boilerplate here"
    assert rows[4].n_lines_removed == 0
    # doc 3 loses its last line only
    assert rows[3].text == "eta theta"


def test_strip_boilerplate_in_doc_duplicates_counted_once(spark):
    """A line repeated INSIDE one doc counts that doc once toward
    line_df (document frequency, not term frequency)."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="x\nx\nx\nbody"),
            Row(doc_id=2, text="y"),
        ]
    )
    freqs = {r.line: r.line_df for r in line_doc_frequencies(df).collect()}
    assert freqs["x"] == 1
    out = strip_boilerplate_lines(df, max_line_df=1)
    assert {r.doc_id: r.text for r in out.collect()}[1] == "x\nx\nx\nbody"


def test_duplicate_line_fraction(spark):
    df = spark.createDataFrame(
        [Row(t="a\nb\na\na"), Row(t="a\nb\nc\nd")]
    )
    got = [
        r.f
        for r in df.select(duplicate_line_fraction("t").alias("f")).collect()
    ]
    assert got == [0.5, 0.0]  # 2 of 4 lines are repeats; none repeat


def test_repetition_signals_top_bigram(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam ham spam ham spam ham spam"),
            Row(doc_id=2, text="one two three four five"),
        ]
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    # doc 1 bigrams: (spam ham) x3, (ham spam) x3 -> top share 3/6
    assert rows[1].top_bigram_frac == 0.5
    # doc 2: four distinct bigrams, top share 1/4
    assert rows[2].top_bigram_frac == 0.25
    assert rows[1].dup_line_frac == 0.0


def test_orc_roundtrip_preserves_schema_and_rows(spark, tmp_path):
    from mpg_data_warehouse_spark.sources.readers import read_orc
    from mpg_data_warehouse_spark.sources.writers import write_orc

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path, partitions=2)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = src.agg(F.sum("o_totalprice").alias("s")).collect()[0].s
    b = back.agg(F.sum("o_totalprice").alias("s")).collect()[0].s
    assert abs(a - b) < 1e-6


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    from mpg_data_warehouse_spark.sources.readers import read_orc
    from mpg_data_warehouse_spark.sources.writers import write_orc

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_orc_pd")
    write_orc(src, path)
    scan = read_orc(spark, path).filter(F.col("o_orderkey") == 7).select(
        "o_orderkey", "o_totalprice"
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "struct<o_orderkey:bigint,o_totalprice:double>" in plan


# --- unicode / whitespace normalization ---


def test_normalize_punct_maps_unicode_to_ascii(spark):
    from mpg_data_warehouse_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [Row(doc_id=1, text="“quoted” — em’s here")]
    )
    got = normalize_text(df).collect()[0].text
    assert got == '"quoted" - em\'s here'


def test_normalize_strips_control_and_zero_width(spark):
    from mpg_data_warehouse_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a​b\x00c­d ﻿e")]
    )
    got = normalize_text(df).collect()[0].text
    assert got == "abcd e"


def test_normalize_collapses_whitespace_keeps_paragraphs(spark):
    from mpg_data_warehouse_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [Row(doc_id=1, text="  a \t b\n\n\n\nc  d\ne  ")]
    )
    got = normalize_text(df).collect()[0].text
    assert got == "a b\n\nc d\ne"


def test_normalize_text_preserves_columns_and_lowercases(spark):
    from mpg_data_warehouse_spark.operators.text import normalize_text

    df = spark.createDataFrame([Row(doc_id=7, text="A’B", lang="en")])
    out = normalize_text(df, lowercase=True)
    assert out.columns == ["doc_id", "text", "lang"]
    row = out.collect()[0]
    assert (row.doc_id, row.text, row.lang) == (7, "a'b", "en")


def test_normalize_makes_visually_identical_dupes_exact(spark):
    """The reason this pass exists: curly-quote / NBSP variants of the
    same text must hash identically after normalization."""
    from mpg_data_warehouse_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="it’s “fine” now"),
            Row(doc_id=2, text="it's \"fine\" now"),
        ]
    )
    norm = normalize_text(df)
    texts = {r.text for r in norm.collect()}
    assert len(texts) == 1
