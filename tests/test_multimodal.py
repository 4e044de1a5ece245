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


def test_real_decoders_quarantine_fake_containers(spark):
    """The fake ASCII container is not a real format: the REAL
    decoders must quarantine it (ok=false, reason recorded), not
    raise — formerly these were NotImplementedError stubs."""
    df = M.attach_fake_image(_docs(spark))
    img = M.decode_image_real(df)
    assert img.filter("ok").count() == 0
    assert img.filter("err IS NULL").count() == 0
    aud = M.decode_audio_real(df)
    assert aud.filter("ok").count() == 0


def _wav_bytes(rate=16000, n=1600, amp=12000, width=2, channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * 440 * i / rate)))
            for i in range(n)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def _bmp_bytes(w=4, h=3, rgb=(10, 200, 30)):
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
    row = (bytes([rgb[2], rgb[1], rgb[0]]) * w).ljust(stride, b"\x00")
    return header + info + row * h


def _ppm_bytes(w=5, h=2, rgb=(100, 50, 250)):
    return (f"P6\n# c\n{w} {h}\n255\n").encode() + bytes(rgb) * (w * h)


def test_decode_audio_real_wav(spark):
    from mpg_data_warehouse_spark.operators.multimodal import decode_audio_real

    df = spark.createDataFrame(
        [(1, _wav_bytes()), (2, b"not audio at all")],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in decode_audio_real(df).collect()}
    good = rows[1]
    assert good.ok and good.sample_rate == 16000 and good.n_channels == 1
    assert good.n_samples == 1600 and good.duration_ms == 100
    assert 0.3 < good.peak < 0.4  # 12000/32768 ≈ 0.366
    assert rows[2].ok is False and rows[2].err


def test_decode_image_real_bmp_and_ppm(spark):
    from mpg_data_warehouse_spark.operators.multimodal import decode_image_real

    df = spark.createDataFrame(
        [(1, _bmp_bytes()), (2, _ppm_bytes()), (3, b"\x89PNG fake")],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in decode_image_real(df).collect()}
    bmp = rows[1]
    assert bmp.ok and bmp.format == "bmp" and (bmp.width, bmp.height) == (4, 3)
    want_luma = 0.299 * 10 + 0.587 * 200 + 0.114 * 30
    assert abs(bmp.mean_luma - want_luma) < 1e-9
    ppm = rows[2]
    assert ppm.ok and ppm.format == "ppm" and (ppm.width, ppm.height) == (5, 2)
    want_luma2 = 0.299 * 100 + 0.587 * 50 + 0.114 * 250
    assert abs(ppm.mean_luma - want_luma2) < 1e-9
    # png needs Pillow (absent here): quarantined, not a failed task
    assert rows[3].ok is False and "unsupported magic" in rows[3].err


# --- perceptual hashing (pHash) ---


def _patterned_bmp(w=48, h=48, shift=0, flip_quadrant=False):
    """Deterministic gradient+checker image; ``shift`` brightens
    slightly (near-dup edit), ``flip_quadrant`` changes content."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
    rows = b""
    for y in range(h):
        row = bytearray()
        for x in range(w):
            v = (x * 5 + y * 3) % 256
            if ((x // 8) + (y // 8)) % 2:
                v = (v + 128) % 256
            if flip_quadrant and x < w // 2 and y < h // 2:
                v = 255 - v
            v = min(255, v + shift)  # saturating brightness edit
            row += bytes([v, v, v])
        rows += bytes(row).ljust(stride, b"\x00")
    return header + info + rows


def test_image_phash_and_near_dup_pairs(spark):
    from mpg_data_warehouse_spark.operators.multimodal import (
        image_phash,
        phash_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, _patterned_bmp()),
            (2, _patterned_bmp(shift=6)),          # slight edit -> near dup
            (3, _patterned_bmp(flip_quadrant=True)),  # different content
            (4, b"not an image"),
        ],
        "doc_id long, content binary",
    )
    hashes = image_phash(df)
    rows = {r.doc_id: r for r in hashes.collect()}
    assert rows[1].ok and rows[2].ok and rows[3].ok
    assert not rows[4].ok and rows[4].phash is None
    assert rows[1].phash == rows[1].phash  # deterministic across runs
    rows2 = {r.doc_id: r.phash for r in image_phash(df).collect()}
    assert rows2[1] == rows[1].phash

    pairs = phash_near_dup_pairs(
        hashes.filter("ok"), max_hamming=10
    ).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 10
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_identical_zero_distance(spark):
    from mpg_data_warehouse_spark.operators.multimodal import (
        _bmp_luma,
        phash64,
    )

    a = phash64(_bmp_luma(_patterned_bmp())[3])
    b = phash64(_bmp_luma(_patterned_bmp())[3])
    assert a == b and a > 0


# --- audio fingerprinting ---


def _chirp_wav(rate=16000, n=16000, amp=12000, scale=1.0,
               tones=(300, 700, 1500, 2500, 900, 400)):
    """Tone ladder — piecewise-stable spectrum, so the band-delta
    bits are robust (a continuous sweep keeps every delta near zero
    and flips bits on any numeric jitter)."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        frames = bytearray()
        seg = n // len(tones)
        for i in range(n):
            f = tones[min(i // seg, len(tones) - 1)]
            v = int(amp * scale * math.sin(2 * math.pi * f * i / rate))
            frames += struct.pack("<h", max(-32768, min(32767, v)))
        wf.writeframes(bytes(frames))
    return buf.getvalue()


def test_audio_fingerprint_and_near_dup(spark):
    from mpg_data_warehouse_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, _chirp_wav()),
            (2, _chirp_wav(scale=0.5)),             # volume-scaled copy
            (3, _chirp_wav(tones=(2500, 400, 1200, 300, 2000, 800))),
            (4, b"junk"),
        ],
        "doc_id long, content binary",
    )
    fps = audio_fingerprint(df)
    rows = {r.doc_id: r for r in fps.collect()}
    assert rows[1].ok and rows[1].n_frames > 10
    assert not rows[4].ok
    # volume scaling leaves the band-delta fingerprint ~unchanged
    same = sum(a == b for a, b in zip(rows[1].fp, rows[2].fp))
    assert same / rows[1].n_frames > 0.5

    pairs = audio_near_dup_pairs(
        fps.filter("ok"), min_match_frac=0.35
    ).collect()
    got = {(r.id_a, r.id_b): r.match_frac for r in pairs}
    assert (1, 2) in got and got[(1, 2)] >= 0.35
    assert (1, 3) not in got


# --- video: frame-pHash signatures + clip near-dup ---


def test_frame_phash_signature_and_video_pairs(spark):
    from mpg_data_warehouse_spark.operators.multimodal import (
        frame_phash_signature,
        video_near_dup_pairs,
    )

    def clip(vid, shifts, flip=False):
        return [
            (vid, i, _patterned_bmp(shift=s, flip_quadrant=flip))
            for i, s in enumerate(shifts)
        ]

    rows = (
        clip(1, [0, 10, 20, 30])
        + clip(2, [2, 12, 22, 32])            # brightness-edited copy
        + clip(3, [0, 10, 20, 30], flip=True)  # different content
        + [(4, 0, b"junk"), (4, 1, _patterned_bmp())]  # partial decode
    )
    frames = spark.createDataFrame(
        rows, "doc_id long, frame_idx int, frame binary"
    )
    sigs = frame_phash_signature(frames)
    by_id = {r.doc_id: r for r in sigs.collect()}
    assert by_id[1].n_frames == 4 and len(by_id[1].sig) == 4
    assert by_id[4].n_frames == 1           # bad frame dropped, not fatal
    assert by_id[1].sig == by_id[2].sig     # saturating edits hash-stable

    pairs = video_near_dup_pairs(sigs, min_match_frac=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_fixture_generators_group_identity(spark):
    """The round-7 contract fixtures: same group → identical pHash
    across MIXED containers (PPM even ids, BMP odd ids — pins the
    bottom-up row flip), different groups far apart; same-group WAV
    clips share their whole sub-fingerprint set."""
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.multimodal import (
        attach_fixture_audio,
        attach_fixture_image,
        audio_fingerprint,
        audio_near_dup_pairs,
        image_phash,
        phash_near_dup_pairs,
    )

    ids = spark.range(24).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("int").alias("grp")
    )
    imgs = attach_fixture_image(ids, "grp")
    hashed = image_phash(imgs).filter(F.col("ok"))
    assert hashed.count() == 24
    joined = {
        (r.doc_id % 4, r.phash) for r in hashed.collect()
    }
    assert len(joined) == 4  # one hash per group despite mixed containers
    pairs = phash_near_dup_pairs(hashed, max_hamming=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    expect = {
        (a, b) for a in range(24) for b in range(24)
        if a < b and a % 4 == b % 4
    }
    assert got == expect

    auds = attach_fixture_audio(ids, "grp")
    fps = audio_fingerprint(auds).filter(F.col("ok"))
    apairs = audio_near_dup_pairs(fps)
    agot = {(r.id_a, r.id_b, r.match_frac) for r in apairs.collect()}
    assert {(a, b) for a, b, _ in agot} == expect
    assert all(f == 1.0 for _, _, f in agot)


def test_phash_pairs_divisor_blocks_no_overflow(spark):
    """max_hamming values where (max_hamming+1) divides 64 used to
    crash: the top block's mask literal exceeded Long.MAX and F.lit
    raised NumberFormatException. The shift+low-mask form covers every
    block count, and recall still holds via the pigeonhole split."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    hashes = spark.createDataFrame(
        [
            Row(doc_id=1, phash=-(1 << 62) + 5),  # high bits set
            Row(doc_id=2, phash=-(1 << 62) + 4),  # hamming 1 from #1
            Row(doc_id=3, phash=(1 << 55) + 17),
        ]
    )
    for mh in (0, 1, 3, 7, 15, 31, 63):  # all the old crashers
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in phash_near_dup_pairs(hashes, max_hamming=mh).collect()
        }
        if mh >= 1:
            assert got[(1, 2)] == 1, f"max_hamming={mh} missed the pair"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(hashes, max_hamming=8, n_blocks=4)
