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

__all__ = ["pack_sequences"]


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
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    toked = df.select(F.col(id_col), F.col(text_col), tokens(text_col).alias("_toks"))
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
