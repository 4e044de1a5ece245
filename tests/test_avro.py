"""Native Avro OCF source/sink: typed round trips, codecs, spec
structure, and loud failures on unsupported schema features."""

from __future__ import annotations

import datetime
import io
import os
import json

import pytest
from pyspark.sql import Row

from mpg_data_warehouse_spark.sources.avro_ocf import (
    MAGIC,
    emit_ocf,
    parse_ocf,
    read_avro,
    write_avro,
)

TYPED_DDL = (
    "id long, name string, score double, ok boolean, "
    "tags array<string>, d date, ts timestamp_ntz, data binary"
)


def _typed(spark):
    return spark.createDataFrame(
        [
            Row(
                id=1, name="alpha", score=1.5, ok=True, tags=["x", "y"],
                d=datetime.date(2021, 3, 4),
                ts=datetime.datetime(2021, 3, 4, 5, 6, 7, 123456),
                data=bytearray(b"\x00\x01"),
            ),
            Row(
                id=2, name=None, score=None, ok=False, tags=[],
                d=None, ts=None, data=None,
            ),
        ],
        TYPED_DDL,
    )


def test_typed_round_trip_with_nulls(spark, tmp_path):
    df = _typed(spark)
    out = str(tmp_path / "avro")
    write_avro(df, out, codec="deflate")
    back = read_avro(spark, out)
    assert back.schema == df.schema
    key = lambda r: r.id  # noqa: E731
    assert sorted(map(tuple, back.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, df.collect()), key=lambda t: t[0]
    )


def test_orders_table_round_trip(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = str(tmp_path / "orders_avro")
    write_avro(orders, out)
    back = read_avro(spark, out)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, orders.collect()))
    assert a == b


def test_codecs_agree_and_deflate_compresses(spark):
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "s", "type": "string"}],
    }
    rows = [{"s": "repetitive text " * 10}] * 50
    raw = emit_ocf(schema, rows, codec="null")
    comp = emit_ocf(schema, rows, codec="deflate")
    assert len(comp) < len(raw) / 3
    for blob in (raw, comp):
        s, recs = parse_ocf(blob)
        assert [r["s"] for r in recs] == [r["s"] for r in rows]


def test_ocf_structure_matches_spec():
    """Spec pin: magic, metadata map with avro.schema/avro.codec,
    16-byte sync marker framing each block."""
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }
    blob = emit_ocf(schema, [{"v": 7}], codec="null")
    assert blob[:4] == MAGIC
    parsed_schema, recs = parse_ocf(blob)
    assert json.loads(json.dumps(parsed_schema)) == schema
    assert list(recs) == [{"v": 7}]


def test_corrupt_sync_marker_raises():
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }
    blob = bytearray(emit_ocf(schema, [{"v": 1}], codec="null"))
    blob[-1] ^= 0xFF  # flip a sync byte
    _, recs = parse_ocf(bytes(blob))
    with pytest.raises(ValueError, match="sync marker"):
        list(recs)


def test_schema_mismatch_across_files_raises(spark, tmp_path):
    out = str(tmp_path / "mix")
    write_avro(
        spark.createDataFrame([Row(a=1)], "a long"), out, codec="null"
    )
    # hand-plant a second file with a different writer schema
    other = emit_ocf(
        {"type": "record", "name": "r",
         "fields": [{"name": "b", "type": "string"}]},
        [{"b": "x"}],
    )
    with open(f"{out}/part-other.avro", "wb") as fh:
        fh.write(other)
    with pytest.raises(Exception, match="schema differs"):
        read_avro(spark, out).collect()


def test_unsupported_spark_type_raises_before_work(spark, tmp_path):
    import decimal

    df = spark.createDataFrame(
        [Row(x=decimal.Decimal("1.25"))], "x decimal(10,2)"
    )
    with pytest.raises(ValueError, match="no Avro mapping"):
        write_avro(df, str(tmp_path / "nope"))


def test_far_future_timestamp_is_microsecond_exact(spark, tmp_path):
    """Exact integer µs arithmetic: float-seconds round-tripping
    loses microseconds once epoch-µs nears 2^53 (~year 2255)."""
    ts = datetime.datetime(2255, 6, 1, 2, 3, 4, 123457)
    df = spark.createDataFrame([Row(id=1, ts=ts)], "id long, ts timestamp_ntz")
    out = str(tmp_path / "far")
    write_avro(df, out)
    got = read_avro(spark, out).first()
    assert got.ts == ts


def test_big_int64_with_nulls_is_exact(spark, tmp_path):
    """The Arrow boundary must not route null-bearing longs through
    pandas float64 — 2^53+1 would silently round."""
    big = 9007199254740993  # 2^53 + 1
    df = spark.createDataFrame(
        [Row(id=1, v=big), Row(id=2, v=None)], "id long, v long"
    )
    out = str(tmp_path / "big")
    write_avro(df, out)
    got = {r.id: r.v for r in read_avro(spark, out).collect()}
    assert got == {1: big, 2: None}


def test_instant_timestamp_and_map_round_trip(spark, tmp_path):
    """TimestampType = spec timestamp-micros (UTC instant);
    string-keyed maps round-trip through the pyarrow pair form."""
    ts = datetime.datetime(2021, 3, 4, 5, 6, 7, 123456)
    df = spark.createDataFrame(
        [Row(id=1, ts=ts, m={"a": 1, "b": 2}), Row(id=2, ts=None, m={})],
        "id long, ts timestamp, m map<string,long>",
    )
    out = str(tmp_path / "inst")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema == df.schema
    rows = {r.id: r for r in back.collect()}
    assert rows[1].ts == ts and rows[1].m == {"a": 1, "b": 2}
    assert rows[2].ts is None and rows[2].m == {}


def test_unknown_logical_type_raises_not_misdecodes():
    blob = emit_ocf(
        {"type": "record", "name": "r",
         "fields": [{"name": "v", "type": "long"}]},
        [{"v": 1}],
    )
    # hand-craft a schema with a decimal logical and try to decode
    import mpg_data_warehouse_spark.sources.avro_ocf as A

    with pytest.raises(ValueError, match="logicalType"):
        A._decode(
            {"type": "bytes", "logicalType": "decimal",
             "precision": 10, "scale": 2},
            io.BytesIO(b"\x02\x01"),
        )
    assert blob[:4] == MAGIC  # keep the fixture used


def test_empty_dataframe_round_trips(spark, tmp_path):
    df = spark.createDataFrame([], "id long, name string")
    out = str(tmp_path / "empty")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema == df.schema
    assert back.count() == 0


def test_write_refuses_nonempty_target_by_default(spark, tmp_path):
    """spark-avro SaveMode parity: a re-run against an existing
    directory must NOT silently accumulate duplicate rows."""
    df = spark.createDataFrame([Row(id=1)], "id long")
    out = str(tmp_path / "t")
    write_avro(df, out)
    with pytest.raises(FileExistsError, match="non-empty"):
        write_avro(df, out)
    # still exactly the original rows
    assert read_avro(spark, out).count() == 1


def test_write_overwrite_swaps_atomically(spark, tmp_path):
    df1 = spark.createDataFrame([Row(id=i) for i in range(5)], "id long")
    df2 = spark.createDataFrame([Row(id=99)], "id long")
    out = str(tmp_path / "t")
    write_avro(df1, out)
    write_avro(df2, out, mode="overwrite")
    got = [r.id for r in read_avro(spark, out).collect()]
    assert got == [99]
    # no staging leftovers beside the target
    leftovers = [p for p in os.listdir(tmp_path) if "__stage-" in p]
    assert leftovers == []


def test_failed_write_leaves_target_untouched(spark, tmp_path):
    """A job that dies mid-write must install NOTHING (and a prior
    good table stays fully readable)."""
    good = spark.createDataFrame([Row(id=1)], "id long")
    out = str(tmp_path / "t")
    write_avro(good, out)

    from pyspark.sql import functions as F

    bad = spark.range(4).select(
        F.when(
            F.assert_true(F.col("id") < 2, F.lit("boom")).isNull(),
            F.col("id"),
        ).alias("id")
    )
    with pytest.raises(Exception):
        write_avro(bad, out, mode="overwrite")
    assert [r.id for r in read_avro(spark, out).collect()] == [1]
    leftovers = [p for p in os.listdir(tmp_path) if "__stage-" in p]
    assert leftovers == []


def test_write_refuses_existing_regular_file_target(spark, tmp_path):
    """mode='error' must also refuse a regular FILE at the target —
    the swap path would otherwise rename pre-existing data away and
    delete it."""
    victim = tmp_path / "out.avro"
    victim.write_bytes(b"precious")
    df = spark.createDataFrame([Row(id=1)], "id long")
    with pytest.raises(FileExistsError):
        write_avro(df, str(victim))
    assert victim.read_bytes() == b"precious"


def test_no_inprogress_files_published(spark, tmp_path):
    df = spark.createDataFrame([Row(id=i) for i in range(10)], "id long")
    out = str(tmp_path / "t")
    write_avro(df, out)
    assert not [n for n in os.listdir(out) if ".inprogress-" in n]


def test_bzip2_and_xz_codecs_round_trip(spark, tmp_path):
    """Spec codecs beyond deflate: bzip2 and xz (both stdlib) — full
    write/read round trips plus raw emit/parse agreement."""
    df = spark.createDataFrame(
        [Row(id=i, s="repetitive " * 20) for i in range(30)],
        "id long, s string",
    )
    for codec in ("bzip2", "xz"):
        out = str(tmp_path / codec)
        write_avro(df, out, codec=codec)
        back = read_avro(spark, out)
        assert back.count() == 30
        assert back.schema == df.schema
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "s", "type": "string"}]}
    rows = [{"s": "repetitive text " * 10}] * 50
    raw = emit_ocf(schema, rows, codec="null")
    for codec in ("bzip2", "xz"):
        comp = emit_ocf(schema, rows, codec=codec)
        assert len(comp) < len(raw) / 3
        _, recs = parse_ocf(comp)
        assert [r["s"] for r in recs] == [r["s"] for r in rows]


def test_unknown_codec_raises_loudly():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    with pytest.raises(ValueError, match="unsupported Avro codec"):
        emit_ocf(schema, [{"v": 1}], codec="zstandard")


def test_snappy_codec_round_trip_and_foreign_decode(spark, tmp_path):
    """snappy: literal-only emit round-trips through write/read, and
    a FOREIGN-style block using real back-reference copies (the form
    a native snappy writer emits) decodes correctly."""
    import zlib as _z

    from mpg_data_warehouse_spark.sources import avro_ocf as A

    df = spark.createDataFrame(
        [Row(id=i, s="payload " * 5) for i in range(20)],
        "id long, s string",
    )
    out = str(tmp_path / "snappy")
    write_avro(df, out, codec="snappy")
    back = read_avro(spark, out)
    assert back.count() == 20 and back.schema == df.schema

    # foreign block: encode records, then snappy-compress WITH a real
    # copy element (hand-built per the format spec) + spec CRC suffix
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "s", "type": "string"}]}
    body = io.BytesIO()
    A._encode(schema, {"s": "abcdabcd"}, body)
    raw = body.getvalue()
    # literal prefix of everything but the trailing 4 bytes, then a
    # copy-1 (len 4, offset 4) replaying them — only valid if the
    # last 8 bytes repeat, which "abcdabcd" guarantees
    assert raw[-8:-4] == raw[-4:]
    def varint(n):
        o = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            o.append(b | 0x80 if n else b)
            if not n:
                return bytes(o)
    lit = raw[:-4]
    comp = varint(len(raw)) + bytes([(len(lit) - 1) << 2]) + lit \
        + bytes([0b01 | ((4 - 4) << 2), 4])
    block = comp + (_z.crc32(raw) & 0xFFFFFFFF).to_bytes(4, "big")
    decoded = A._CODECS["snappy"][1](block)
    assert decoded == raw
    # corrupt CRC raises
    bad = comp + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="CRC32 mismatch"):
        A._CODECS["snappy"][1](bad)


def test_snappy_varint_rejects_six_bytes():
    """A 32-bit snappy length preamble is at most 5 varint bytes; a
    continuation bit on the 5th byte must raise, not read a 6th."""
    from mpg_data_warehouse_spark.sources import snappy_codec

    six = bytes([0x80, 0x80, 0x80, 0x80, 0x80, 0x01])
    with pytest.raises(ValueError, match="varint too long"):
        snappy_codec._read_varint(six, 0)
    # a valid 5-byte varint still decodes
    five = bytes([0x80, 0x80, 0x80, 0x80, 0x01])
    val, pos = snappy_codec._read_varint(five, 0)
    assert val == 1 << 28 and pos == 5


def test_snappy_decompress_bounds_output_as_it_grows():
    """A stream whose elements overshoot the declared length must fail
    BEFORE materializing the over-long output (copy-tag amplification
    guard), and max_length caps the declared size itself."""
    from mpg_data_warehouse_spark.sources import snappy_codec

    # declared length 4, literal 'ab', then an RLE copy of len 8:
    # would reach 10 > 4 — must raise at the copy, not at the end
    bad = bytes([4]) + bytes([1 << 2]) + b"ab" + bytes(
        [(0b01) | (4 << 2)]  # copy-1: len 4+4=8, offset high bits 0
    ) + bytes([1])  # offset 1
    with pytest.raises(ValueError, match="exceeds declared length"):
        snappy_codec.decompress(bad)
    # a literal overshooting the declared length fails the same way
    bad_lit = bytes([1]) + bytes([2 << 2]) + b"abc"
    with pytest.raises(ValueError, match="exceeds declared length"):
        snappy_codec.decompress(bad_lit)
    # max_length rejects an honest-but-huge declared size up front
    ok = snappy_codec.compress_literal(b"x" * 100)
    assert snappy_codec.decompress(ok, max_length=100) == b"x" * 100
    with pytest.raises(ValueError, match="exceeds cap"):
        snappy_codec.decompress(ok, max_length=99)


def test_compiled_codec_matches_interpreted():
    """The schema-compiled encoder/decoder (the r13 hot-path rewrite
    emit_ocf / parse_ocf_blocks run on) must be byte-for-byte and
    value-for-value identical to the interpreted reference forms
    (_encode/_decode) across every supported type family: primitives,
    null unions, date / instant / NTZ-timestamp logicals, arrays,
    string-keyed maps, and nested records."""
    import mpg_data_warehouse_spark.sources.avro_ocf as A

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "ni", "type": ["null", "long"]},
            {"name": "neg", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {
                "name": "lt",
                "type": {
                    "type": "long",
                    "logicalType": "local-timestamp-millis",
                },
            },
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": ["null", "string"]}],
                },
            },
        ],
    }
    rows = [
        {
            "i": 2**61,
            "ni": None,
            "neg": -12345,
            "f": 1.5,
            "d": -2.25,
            "b": True,
            "s": "héllo ☃",
            "by": b"\x00\xff",
            "dt": datetime.date(1969, 12, 31),
            "ts": datetime.datetime(
                2021, 3, 4, 5, 6, 7, 123456, tzinfo=datetime.timezone.utc
            ),
            "lt": datetime.datetime(1999, 12, 31, 23, 59, 59, 421000),
            "arr": [1, -2, 3],
            "m": {"a": 0.5, "b": -1.0},
            "nested": {"x": "y"},
        },
        {
            "i": 0,
            "ni": -7,
            "neg": 0,
            "b": False,
            "f": -0.0,
            "d": 1e300,
            "s": "",
            "by": b"",
            "dt": datetime.date(2262, 4, 11),
            "ts": datetime.datetime(
                1960, 1, 1, 0, 0, 0, 1, tzinfo=datetime.timezone.utc
            ),
            "lt": datetime.datetime(1970, 1, 1, 0, 0, 0, 0),
            "arr": [],
            "m": {},
            "nested": {"x": None},
        },
    ]
    enc = A._compile_encoder(schema)
    dec = A._compile_decoder(schema)
    for row in rows:
        ref = io.BytesIO()
        A._encode(schema, row, ref)
        fast = bytearray()
        enc(row, fast)
        assert bytes(fast) == ref.getvalue()
        got_ref = A._decode(schema, io.BytesIO(ref.getvalue()))
        got_fast, pos = dec(bytes(fast), 0)
        assert pos == len(fast)
        assert got_fast == got_ref
    # compile-time guards match the interpreted behavior
    with pytest.raises(ValueError, match="logicalType"):
        A._compile_decoder(
            {"type": "bytes", "logicalType": "decimal", "scale": 2}
        )
    with pytest.raises(ValueError, match="union branch index"):
        A._compile_decoder(["null", "long"])(b"\x08", 0)
    with pytest.raises(EOFError, match="truncated varint"):
        A._compile_decoder("long")(b"\x80", 0)
