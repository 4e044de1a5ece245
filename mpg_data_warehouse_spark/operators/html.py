"""HTML → text extraction with boilerplate-block filtering — the
stage UPSTREAM of the curation funnel: web corpora arrive as HTML,
and ``text.strip_boilerplate_lines`` / ``quality_score`` assume
pre-extracted text.

Heuristics follow the public jusText / trafilatura recipe (Pomikálek
2011): strip non-content markup structurally (scripts, styles,
comments, head, and nav/footer/header/aside containers), segment the
remainder at block-level tags, then judge each block by

* **length** — boilerplate blocks are short;
* **link density** — the fraction of a block's characters inside
  ``<a>`` anchors (menus and footers are links wall to wall);
* **stopword density** — real prose in a language uses its function
  words constantly; machine-generated chrome ("Home | About |
  Contact") doesn't.

Everything is ``regexp_replace`` / ``split`` / higher-order-function
column math — one narrow map, zero UDFs, zero shuffles: 100 TB of
HTML extracts at scan speed (the zero-Python-UDF policy the rest of
the engine holds, §2.10).

This is a heuristic extractor for pipeline-scale curation, not a
spec-complete HTML5 parser: regex tag handling is the documented
trade (same stance as trafilatura's fallback mode); pathological
markup degrades to over-stripping, never to a crash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.text import STOPWORDS

__all__ = ["extract_html_text", "html_block_stats"]

# containers whose CONTENT is boilerplate by construction
_DROP_CONTENT = ("script", "style", "noscript", "template", "head",
                 "nav", "footer", "header", "aside", "svg")
# tags that terminate a text block (opening or closing form)
_BLOCK_TAGS = (
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
    "blockquote", "pre", "figure", "figcaption", "main", "form",
)

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last — earlier entities must not double-decode
)


def _strip_noncontent(col: Column) -> Column:
    out = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    for tag in _DROP_CONTENT:
        # the (?<!/) lookbehind excludes SELF-CLOSING forms (<svg/>,
        # <svg .../>): without it `[^>]*` consumes the slash and an
        # inline self-closing icon either pairs with a LATER close tag
        # (terminated regex — swallowing real content between) or, in
        # the unterminated fallback, deletes the entire rest of the
        # document; a self-closing tag HAS no content to drop
        out = F.regexp_replace(
            out, rf"(?is)<{tag}\b[^>]*(?<!/)>.*?</{tag}\s*>", " "
        )
        # unterminated variant: drop to end of input rather than
        # letting a broken <script> leak code into the text
        out = F.regexp_replace(out, rf"(?is)<{tag}\b[^>]*(?<!/)>.*$", " ")
    return out


def _tags_to_text(col: Column) -> Column:
    """Strip remaining inline tags and decode the common entities."""
    out = F.regexp_replace(col, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def _block_structs(
    html_col: str, stopwords: tuple[str, ...]
) -> Column:
    """array<struct<txt, n_chars, link_density, stop_frac>> — one
    entry per non-empty block of the document."""
    block_split = (
        r"(?i)</?(?:" + "|".join(_BLOCK_TAGS) + r")\b[^>]*/?>"
    )
    blocks = F.split(_strip_noncontent(F.col(html_col)), block_split)

    def per_block(b):
        # anchor text chars BEFORE tag-stripping (the link-density
        # numerator); regexp_extract_all pulls every <a>…</a> body
        anchor_bodies = F.regexp_extract_all(
            b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1
        )
        anchor_chars = F.aggregate(
            F.transform(
                anchor_bodies, lambda a: F.length(_tags_to_text(a))
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        txt = _tags_to_text(b)
        words = F.filter(
            F.split(F.lower(txt), r"\s+"), lambda w: w != F.lit("")
        )
        n_words = F.size(words)
        n_stop = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
        return F.struct(
            txt.alias("txt"),
            F.length(txt).alias("n_chars"),
            (
                F.least(
                    F.lit(1.0),
                    anchor_chars
                    / F.greatest(F.length(txt), F.lit(1)).cast("double"),
                )
            ).alias("link_density"),
            (
                n_stop / F.greatest(n_words, F.lit(1)).cast("double")
            ).alias("stop_frac"),
        )

    structs = F.transform(blocks, per_block)
    return F.filter(structs, lambda s: s["n_chars"] > 0)


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_block_chars: int = 25,
    max_link_density: float = 0.4,
    min_stopword_frac: float = 0.0,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Append ``out_col``: the document's content text — kept blocks
    joined with blank lines (the paragraph boundary
    ``chunking.pack_paragraphs`` and ``text.strip_boilerplate_lines``
    expect) — plus ``n_blocks_kept`` / ``n_blocks_total`` audit
    counts. ``min_stopword_frac`` defaults OFF (0.0): it is a strong
    precision lever for single-language corpora but wrong for mixed-
    language crawls unless ``stopwords`` matches the language."""
    if out_col == html_col:
        raise ValueError(
            "out_col must differ from html_col (the source column is "
            "still referenced while extracting)"
        )
    structs = _block_structs(html_col, stopwords)
    kept = F.filter(
        structs,
        lambda s: (s["n_chars"] >= F.lit(min_block_chars))
        & (s["link_density"] <= F.lit(float(max_link_density)))
        & (s["stop_frac"] >= F.lit(float(min_stopword_frac))),
    )
    # withColumn semantics for the outputs: REPLACE any pre-existing
    # column of the same name (a select("*", alias) would duplicate
    # the name and poison every later reference as ambiguous)
    return (
        df.withColumn("_hb", structs)
        .withColumn("_hk", kept)
        .withColumn(
            out_col,
            F.concat_ws(
                "\n\n", F.transform(F.col("_hk"), lambda s: s["txt"])
            ),
        )
        .withColumn("n_blocks_kept", F.size("_hk").cast("long"))
        .withColumn("n_blocks_total", F.size("_hb").cast("long"))
        .drop("_hb", "_hk")
    )


def html_block_stats(
    df: DataFrame,
    html_col: str = "html",
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Exploded per-block view (txt, n_chars, link_density,
    stop_frac) for threshold tuning — run it on a sample, pick
    cutoffs, then extract with them."""
    return df.select(
        "*", F.explode(_block_structs(html_col, stopwords)).alias("_b")
    ).select(
        *df.columns,
        F.col("_b.txt").alias("block_text"),
        F.col("_b.n_chars").alias("n_chars"),
        F.col("_b.link_density").alias("link_density"),
        F.col("_b.stop_frac").alias("stop_frac"),
    )
