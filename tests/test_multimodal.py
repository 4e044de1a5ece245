"""Multimodal binary-column plumbing: fake-container attach/decode
round trips, 1→N frame fan-out, real-decoder stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mpg_data_warehouse_spark.operators import multimodal as M


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, n_chars=100),
            Row(doc_id=1, n_chars=300),
            Row(doc_id=7, n_chars=999),
        ]
    )


def test_image_round_trip(spark):
    out = M.decode_image_meta(M.attach_fake_image(_docs(spark))).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].width == 64 and by_id[0].height == 48
    assert by_id[0].format == "png" and by_id[0].body_len == 100
    assert by_id[1].format == "jpeg"
    assert by_id[7].width == 64 + 7 % 8 * 32
    assert by_id[7].body_len == 999 % 256


def test_image_schema_is_typed(spark):
    df = M.decode_image_meta(M.attach_fake_image(_docs(spark)))
    assert df.schema == M.IMAGE_META_SCHEMA


def test_audio_round_trip(spark):
    out = M.decode_audio_meta(M.attach_fake_audio(_docs(spark))).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].sample_rate == 8000
    assert by_id[0].n_samples == 100 * 100
    assert by_id[0].duration_ms == 10000 * 1000 // 8000
    assert by_id[1].sample_rate == 16000


def test_frame_fanout(spark):
    frames = M.sample_frames(M.attach_fake_image(_docs(spark)), n_frames=4)
    rows = frames.collect()
    assert len(rows) == 3 * 4  # every doc yields exactly n_frames rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        assert sorted(r.frame_idx for r in doc_rows) == [0, 1, 2, 3]
        # reassembled prefix lengths are consistent: first 3 equal-size
        sizes = [len(r.frame) for r in sorted(doc_rows, key=lambda r: r.frame_idx)]
        assert len(set(sizes[:3])) == 1
        assert sizes[3] <= sizes[0]


def test_real_decoders_are_marked_stubs(spark):
    df = M.attach_fake_image(_docs(spark))
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image_real(df)
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_audio_real(df)
