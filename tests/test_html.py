"""HTML→text extraction: structural stripping, block filtering by
length / link density / stopword density, entity decoding, and the
curation-pipeline composition."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.html import (
    extract_html_text,
    html_block_stats,
)

PAGE = """<!DOCTYPE html><html><head><title>T</title>
<script>var x = "the the the the menu junk";</script>
<style>.a { color: red }</style></head>
<body>
<nav><a href="/">Home</a> | <a href="/about">About</a></nav>
<h1>The Story of a Data Engine</h1>
<p>The engine reads the tables and is built to scan a hundred
terabytes of data in a day, and the design of the planner is the key
to the whole system.</p>
<p>Short.</p>
<div>Check out <a href="/x">this link</a> and <a href="/y">another
link here</a> now</div>
<p>A second real paragraph follows the first one, and it also talks
about the shuffle, the join, and the scan, in plain prose of the
kind a reader expects.</p>
<footer>Copyright 2026 · <a href="/tos">Terms</a></footer>
</body></html>"""


def _df(spark, html=PAGE):
    return spark.createDataFrame([Row(doc_id=1, html=html)])


def test_extracts_prose_and_drops_boilerplate(spark):
    out = extract_html_text(_df(spark)).first()
    # the two real paragraphs and the headline survive
    assert "scan a hundred" in out.text
    assert "second real paragraph" in out.text
    assert "Story of a Data Engine" in out.text
    # script/style/nav/footer content never leaks
    for junk in ("menu junk", "color: red", "Home", "Copyright", "Terms"):
        assert junk not in out.text
    # short block and link-wall block are filtered
    assert "Short." not in out.text
    assert "this link" not in out.text
    assert out.n_blocks_kept == 3
    assert out.n_blocks_total == 5
    # paragraph boundary preserved for pack_paragraphs downstream
    assert "\n\n" in out.text


def test_entity_decoding_and_no_double_unescape(spark):
    html = "<p>a &amp;lt; b &lt; c &quot;q&quot; &nbsp; d &#39;e&#39; done ok</p>"
    out = extract_html_text(
        _df(spark, html), min_block_chars=1, min_stopword_frac=0.0
    ).first()
    # &amp;lt; decodes to literal "&lt;" (never twice to "<")
    assert "a &lt; b < c \"q\"" in out.text
    assert "'e'" in out.text


def test_unterminated_script_does_not_leak_code(spark):
    html = "<p>Real prose about the engine and the data here.</p><script>var broken = 1;"
    out = extract_html_text(_df(spark, html), min_block_chars=10).first()
    assert "Real prose" in out.text
    assert "broken" not in out.text


def test_block_stats_expose_tuning_signals(spark):
    rows = {
        r.block_text: r
        for r in html_block_stats(_df(spark)).collect()
    }
    links = next(t for t in rows if "link" in t)
    assert rows[links].link_density > 0.4
    prose = next(t for t in rows if "second real paragraph" in t)
    assert rows[prose].link_density == 0.0
    assert rows[prose].stop_frac > 0.2


def test_stopword_gate_drops_chrome(spark):
    html = (
        "<p>Product Gallery Pricing Download Enterprise Features "
        "Solutions Integrations Documentation Resources</p>"
        "<p>The planner is the part of the engine that turns a query "
        "into a plan and it is the key to all of the performance.</p>"
    )
    out = extract_html_text(
        _df(spark, html), min_block_chars=10, min_stopword_frac=0.2
    ).first()
    assert "planner" in out.text
    assert "Pricing" not in out.text


def test_curation_pipeline_composes_from_html(spark):
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    pages = spark.createDataFrame(
        [
            Row(doc_id=i, source="web", html=PAGE.replace(
                "a hundred", f"a hundred {i}"))
            for i in range(3)
        ]
        # an all-boilerplate page: extracted empty, dropped by quality
        + [Row(doc_id=99, source="web",
               html="<nav><a href='/'>Home</a></nav>")]
    )
    chunks = curate_corpus_pipeline(
        pages, html_col="html", min_quality=0.3, max_tokens=32, overlap=4
    )
    got = chunks.select("doc_id").distinct()
    ids = {r.doc_id for r in got.collect()}
    assert 99 not in ids
    assert len(ids) >= 1
    texts = " ".join(r.chunk_text for r in chunks.collect())
    assert "Home" not in texts


def test_out_col_replaces_existing_column(spark):
    """A frame that already carries a 'text' column gets it REPLACED,
    never duplicated (an ambiguous duplicate name poisons every later
    reference)."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="old extracted", html=PAGE)]
    )
    out = extract_html_text(df)
    assert out.columns.count("text") == 1
    row = out.first()
    assert "second real paragraph" in row.text
    # downstream references work (this raised AMBIGUOUS_REFERENCE
    # before the fix)
    assert out.filter(F.col("text").contains("Engine")).count() == 1


def test_out_col_equal_to_html_col_rejected(spark):
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError, match="must differ"):
        extract_html_text(df, html_col="html", out_col="html")
