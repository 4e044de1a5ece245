"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

Design for 100 TB: the binary payload never leaves the executor as
anything but Arrow record batches; decode / feature-extraction /
frame-sampling are per-batch Python (vectorized over the batch), with
schemas declared up front so Catalyst can prune and the sink can
partition. The actual media codecs (Pillow / libsndfile / ffmpeg) are
NOT in this environment, so the decode *body* is stubbed two ways:

* ``decode_image_meta`` / ``decode_audio_meta`` / ``sample_frames``
  parse a deterministic fake container format (``attach_fake_*``
  below) — the Spark-side plumbing (binary column, batch iteration,
  output schema, row fan-out) is real and oracle-checkable.
* ``decode_image_real`` and friends raise ``NotImplementedError``
  with the dependency name — swap their parse body for the real codec
  in an environment that has it; the plan shape does not change.

Fake container layout (ASCII, so both engines can reason about it):
``IMG1|{width}|{height}|{format}|{body}`` — header fields derived
deterministically from the id column, body a repeated filler sized
from the source row, so every decoded field is independently
computable by the DuckDB oracle without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FORMATS = ("png", "jpeg", "webp")

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("body_len", LongType()),
    ]
)

AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_fake_image(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """Deterministic synthetic image payload in a ``content`` binary
    column. Width/height/format derive from the id, body length from
    ``size_col`` — every field the decoder will emit is reproducible
    by pure SQL on the source table (the oracle's contract)."""
    i = F.col(id_col)
    width = (F.lit(64) + (i % 8) * 32).cast("int")
    height = (F.lit(48) + (i % 6) * 32).cast("int")
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in IMAGE_FORMATS]), (i % 3 + 1).cast("int")
    )
    body_len = (F.col(size_col) % 256).cast("int")
    payload = F.concat(
        F.concat_ws(
            "|",
            F.lit("IMG1"),
            width.cast("string"),
            height.cast("string"),
            fmt,
        ),
        F.lit("|"),
        F.repeat(F.lit("x"), body_len),
    )
    return df.withColumn("content", payload.cast("binary"))


def attach_fake_audio(
    df: DataFrame, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """Synthetic audio payload: ``AUD1|{rate}|{n_samples}|{body}``."""
    i = F.col(id_col)
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)), (i % 3 + 1).cast("int")
    )
    n_samples = (F.col(size_col).cast("long") * 100).cast("long")
    payload = F.concat_ws(
        "|", F.lit("AUD1"), rate.cast("string"), n_samples.cast("string"), F.lit("s")
    )
    return df.withColumn("content", payload.cast("binary"))


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched header decode: binary content → typed metadata.

    The parse body is the fake-container reader; a production deploy
    replaces ONLY the inner loop with e.g. ``PIL.Image.open`` — batch
    iteration, output schema, and partitioning are already the real
    thing. Narrow (no shuffle); scales with input splits."""
    src = df.select(F.col(id_col).cast("long"), F.col(content_col))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, fmts, lens = [], [], [], [], []
            for doc_id, raw in zip(pdf[id_col], pdf[content_col]):
                head = bytes(raw).split(b"|", 4)
                ids.append(doc_id)
                widths.append(int(head[1]))
                heights.append(int(head[2]))
                fmts.append(head[3].decode())
                lens.append(len(head[4]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "format": fmts,
                    "body_len": pd.Series(lens, dtype="int64"),
                }
            )

    return src.mapInPandas(parse, IMAGE_META_SCHEMA)


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Audio analog of ``decode_image_meta``; emits duration from the
    header fields (rate, n_samples)."""
    src = df.select(F.col(id_col).cast("long"), F.col(content_col))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf[id_col], pdf[content_col]):
                head = bytes(raw).split(b"|", 3)
                rate, n = int(head[1]), int(head[2])
                rows.append((doc_id, rate, n, n * 1000 // rate))
            out = pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "duration_ms"]
            )
            yield out.astype(
                {
                    "doc_id": "int64",
                    "sample_rate": "int32",
                    "n_samples": "int64",
                    "duration_ms": "int64",
                }
            )

    return src.mapInPandas(parse, AUDIO_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling: one input row fans out to ``n_frames`` rows of
    equal byte slices (the video analog: evenly-spaced keyframes).
    Demonstrates the 1→N batch shape ``mapInPandas`` handles natively —
    the output batch need not align with the input batch."""
    src = df.select(F.col(id_col).cast("long"), F.col(content_col))

    def slice_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, raw in zip(pdf[id_col], pdf[content_col]):
                data = bytes(raw)
                step = max(len(data) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(data[k * step : (k + 1) * step])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return src.mapInPandas(slice_frames, FRAME_SCHEMA)


def decode_image_real(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Real image decode — requires Pillow, which this environment
    does not ship. The fake-path ``decode_image_meta`` exercises the
    identical Spark plumbing; swap its parse body for this one where
    Pillow exists."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "decode_image_real requires Pillow (PIL); unavailable here. "
            "Use decode_image_meta (deterministic fake container) — the "
            "mapInPandas plumbing is identical."
        ) from exc
    raise NotImplementedError("wire PIL.Image.open over the batch here")


def decode_audio_real(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Real audio decode — requires soundfile/librosa (absent here).
    See ``decode_image_real`` for the substitution contract."""
    raise NotImplementedError(
        "decode_audio_real requires an audio codec library (soundfile/"
        "librosa); unavailable here. Use decode_audio_meta."
    )
