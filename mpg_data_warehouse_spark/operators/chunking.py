"""Sequence packing / document chunking for training-data prep:
split documents into fixed-token-budget windows with overlap — the
step between cleaning/dedup and tokenizer ingestion in an LLM data
pipeline.

Scale notes: pure narrow map — tokenize once per row (bound column),
compute the chunk count arithmetically, explode a chunk-index
sequence, slice. No shuffle, no state; 100 TB chunks at scan speed.
All arithmetic is integer (no float ceil), so the DuckDB oracle
replays the chunk grid exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.text import tokens

__all__ = ["pack_sequences", "pack_paragraphs"]


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into overlapping windows of at most
    ``max_tokens`` whitespace tokens, stepping by ``max_tokens −
    overlap``. Output: (id, chunk_id, chunk_text, n_tokens), with
    chunk_id 0-based.

    Chunk count is ``1`` for docs within budget, else
    ``1 + ceil((len − max) / stride)`` computed in exact integer math
    (``(len − max + stride − 1) div stride``) — the formula the oracle
    mirrors with ``//``.
    """
    if not 0 <= overlap < max_tokens:
        # negative overlap makes stride EXCEED max_tokens: the tokens
        # between consecutive windows would appear in no chunk at all
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # null-text docs must NOT vanish (size(null)=NULL → null sequence
    # → explode drops the row: silent corpus loss the sibling
    # subword_tokenize avoids with posexplode_outer), and the
    # split-of-empty [''] artifact must not count as a token — so the
    # token array is null-coalesced and empty-filtered: empty/null
    # docs emit one (chunk_id=0, '', n_tokens=0) row. Non-empty text
    # never produces empty tokens (split of trim), so chunking of
    # real documents is unchanged.
    toked = df.select(
        F.col(id_col),
        F.col(text_col),
        F.filter(
            tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    n = F.size("_toks")
    # integer division via `div` (truncating) — DuckDB `//` equivalent
    n_chunks = F.when(n <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.expr(f"(size(_toks) - {max_tokens} + {stride - 1}) div {stride}")
    )
    chunked = toked.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    chunk_toks = F.slice(
        F.col("_toks"), (F.col("chunk_id") * stride + 1).cast("int"), max_tokens
    )
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
        F.size(chunk_toks).cast("long").alias("n_tokens"),
    )


def pack_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
) -> DataFrame:
    """Boundary-aware sequence packing: greedily fill each chunk with
    consecutive WHOLE paragraphs up to ``max_tokens`` — the packing
    real pipelines prefer over mid-sentence splits, because a training
    window that opens mid-thought costs the model context. A paragraph
    that alone exceeds the budget gets its own (oversized) chunk —
    detectable as ``n_tokens > max_tokens``; feed those through
    ``pack_sequences`` if hard caps matter more than boundaries.

    Output: (id, chunk_id, chunk_text, n_tokens); paragraphs are
    rejoined with a blank line. Docs with no non-blank paragraph emit
    nothing.

    The greedy scan is SEQUENTIAL per document but runs entirely
    in-row via ``aggregate()`` over the paragraph array (fold:
    running token count → chunk id per paragraph) — a pure narrow map
    like ``pack_sequences``: no shuffle, no window, no Python; the
    per-row work is O(paragraphs × chunks), both small for real
    documents.
    """
    # Paragraph boundary = a blank line, where "blank" tolerates CRLF
    # line endings and whitespace-only lines — '\n{2,}' alone would
    # treat a CRLF document as ONE paragraph and emit it as a single
    # oversized chunk, silently defeating the token budget.
    # backtick-quote the column name in the expr string: a raw splice
    # breaks (or worse, evaluates) names needing quoting, unlike the
    # F.col() every other operator uses
    _tc = "`" + text_col.replace("`", "``") + "`"
    base = df.select(
        F.col(id_col),
        F.expr(
            f"filter(split({_tc}, '(\\r?\\n[ \\t]*){{2,}}'),"
            " p -> trim(p) != '')"
        ).alias("_paras"),
    ).filter(F.size("_paras") > 0)
    counted = base.withColumn(
        "_pcnt",
        F.expr(
            "transform(_paras, p -> size(filter(split(trim(p), '\\\\s+'),"
            " t -> t != '')))"
        ),
    )
    # Greedy fold: paragraph i joins the current chunk if it fits (or
    # if the chunk is empty — the lone-oversized-paragraph case), else
    # opens the next chunk. `ids` is the nondecreasing chunk id per
    # paragraph.
    assigned = counted.withColumn(
        "_ids",
        F.expr(
            "aggregate(_pcnt, "
            "named_struct('chunk', cast(0 as int), 'cnt', cast(0 as int), "
            "'ids', cast(array() as array<int>)), "
            "(acc, c) -> case "
            f"when acc.cnt = 0 or acc.cnt + c <= {int(max_tokens)} "
            "then named_struct('chunk', acc.chunk, 'cnt', acc.cnt + c, "
            "'ids', concat(acc.ids, array(acc.chunk))) "
            "else named_struct('chunk', acc.chunk + 1, 'cnt', c, "
            "'ids', concat(acc.ids, array(acc.chunk + 1))) end, "
            "acc -> acc.ids)"
        ),
    )
    exploded = assigned.select(
        F.col(id_col),
        "_paras",
        "_ids",
        "_pcnt",
        F.explode(
            F.expr("sequence(cast(0 as int), element_at(_ids, -1))")
        ).alias("chunk_id"),
    )
    chunk_text = F.expr(
        "array_join(transform(filter(arrays_zip(_paras, _ids), "
        "x -> x._ids = chunk_id), x -> trim(x._paras)), '\\n\\n')"
    )
    # n_tokens from the already-computed per-paragraph counts, NOT
    # tokens(chunk_text): lambda-bearing expressions are excluded from
    # subexpression elimination, so re-deriving the count from the
    # text would evaluate the whole zip/filter/join pipeline twice
    # per output row. Paragraphs join on whitespace, so the sum equals
    # the tokenized count exactly.
    n_tokens = F.expr(
        "aggregate(filter(arrays_zip(_pcnt, _ids), x -> x._ids = chunk_id), "
        "cast(0 as int), (a, x) -> a + x._pcnt)"
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long"),
        chunk_text.alias("chunk_text"),
        n_tokens.cast("long").alias("n_tokens"),
    )
