"""Native Avro Object Container File source/sink.

The external ``spark-avro`` module cannot be deployed in an offline
environment (it is not bundled with PySpark), so this module
implements the PUBLIC Avro 1.11 Object Container File spec
(avro.apache.org/docs/1.11.1/specification — magic ``Obj\\x01``,
metadata map with ``avro.schema``/``avro.codec``, sync-marker-delimited
data blocks, zigzag-varint primitives) directly: the same
close-the-gap-natively move as ``sources/txlog.py`` for Delta.

Position in the engine: a COMPATIBILITY boundary, not the hot path.
Decoding a row-oriented binary format is inherently per-record work
no Spark builtin expresses, so it rides ``binaryFile`` →
``mapInArrow``: Arrow batches in and out, NO pandas in the loop —
pandas coerces null-bearing int64 columns to float64 and silently
corrupts integers above 2^53 (caught in review; Arrow preserves
exact types and nulls). On a cluster with spark-avro available, swap
``spark.read.format("avro")`` in; schema mappings follow the same
spec table (timestamp-micros ↔ TimestampType instants,
local-timestamp-micros ↔ TimestampNTZType).

Scale shape: one Avro file = one task (``binaryFile`` splits at file
granularity — parallelism follows the file layout, so write many
moderate files, standard Avro practice). Within a task the records
decode block-by-block, one Arrow batch per Avro block; per-task
memory is the raw file bytes (inherent to binaryFile) plus ONE
decompressed block's rows. The driver reads only the first file's
HEADER for schema inference. The writer emits one OCF per partition
directly to the target directory (shared-filesystem contract, like
the txlog format; an object-store deployment routes the blobs
through its own put), and an all-empty frame still writes one
zero-row schema-carrying file so the directory reads back cleanly.

Supported types (the warehouse's surface): null, boolean, int, long,
float, double, string, bytes, records, arrays, string-keyed maps,
2-branch null unions (nullable columns), and the date /
timestamp-micros/millis (instant) / local-timestamp-micros/millis
(NTZ) logical types. Codecs: null, deflate (stdlib
zlib), bzip2/xz (stdlib bz2/lzma), and snappy (pure-Python block
format + spec CRC32 — full decode, literal-only encode; see
``snappy_codec``). Any
OTHER schema feature — unknown codecs, multi-branch unions, enums,
fixed, decimal/uuid/time logicals — raises loudly; this reader
deliberately deviates from the spec's "ignore unknown logical
types" advice because silently surfacing a decimal as raw bytes is
a wrong answer, not a fallback.
"""

from __future__ import annotations

import bz2
import datetime
import io
import json
import lzma
import os
import shutil
import struct
import uuid
import zlib


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


# Deflate effort: level 6 (zlib default) compresses within ~2% of
# level 9 on varint-dense Avro bodies at a fraction of the CPU — the
# r13 measurement had level 9 spending ~35% of the write job inside
# compressobj. Env-tunable for deployments that prefer a different
# CPU/size point on cold archival writes; decode is level-agnostic.
_DEFLATE_LEVEL = int(os.environ.get("SPARK_GRAFT_AVRO_DEFLATE_LEVEL", "6"))


def _deflate_raw(b: bytes) -> bytes:
    co = zlib.compressobj(_DEFLATE_LEVEL, zlib.DEFLATED, -15)
    return co.compress(b) + co.flush()


def _snappy_block_compress(b: bytes) -> bytes:
    # Avro spec: snappy data followed by the 4-byte BIG-ENDIAN CRC32
    # of the UNCOMPRESSED bytes. The emitter writes a literal-only
    # snappy stream (valid for every decoder; see snappy_codec) —
    # interop is the point, compression comes from deflate/bzip2/xz.
    from mpg_data_warehouse_spark.sources.snappy_codec import (
        compress_literal,
    )

    return compress_literal(b) + (zlib.crc32(b) & 0xFFFFFFFF).to_bytes(
        4, "big"
    )


def _snappy_block_decompress(b: bytes) -> bytes:
    from mpg_data_warehouse_spark.sources.snappy_codec import decompress

    if len(b) < 4:
        raise ValueError("snappy block too short for its CRC32 suffix")
    out = decompress(b[:-4])
    want = int.from_bytes(b[-4:], "big")
    if (zlib.crc32(out) & 0xFFFFFFFF) != want:
        raise ValueError(
            "snappy block CRC32 mismatch (corrupt uncompressed data)"
        )
    return out


# spec codec name → (compress, decompress). deflate is RAW (no zlib
# header) per spec; bzip2/xz use their standard framings; snappy is
# a pure-Python block-format decoder (full) + literal-only encoder
# with the spec's uncompressed-CRC32 suffix (sources/snappy_codec).
_CODECS = {
    "null": (lambda b: b, lambda b: b),
    "deflate": (_deflate_raw, lambda b: zlib.decompress(b, -15)),
    "bzip2": (bz2.compress, bz2.decompress),
    "xz": (
        lambda b: lzma.compress(b, format=lzma.FORMAT_XZ),
        lzma.decompress,
    ),
    "snappy": (_snappy_block_compress, _snappy_block_decompress),
}

MAGIC = b"Obj\x01"
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH = datetime.datetime(1970, 1, 1)
_UTC = datetime.timezone.utc
_KNOWN_LOGICALS = (
    "date",
    "timestamp-micros",
    "timestamp-millis",
    "local-timestamp-micros",
    "local-timestamp-millis",
)

# ---------------------------------------------------------------------------
# binary primitives (Avro spec §"Binary encoding")
# ---------------------------------------------------------------------------


def _read_long(buf) -> int:
    """Zigzag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_exact(buf, n: int) -> bytes:
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"truncated read: wanted {n}, got {len(data)}")
    return data


def _read_bytes(buf) -> bytes:
    return _read_exact(buf, _read_long(buf))


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------
# schema-driven decode / encode
# ---------------------------------------------------------------------------


def _micros_since_epoch(value: datetime.datetime) -> int:
    """Exact integer µs — float-seconds conversion loses microseconds
    once the value nears 2^53 (~year 2255)."""
    if value.tzinfo is not None:
        value = value.astimezone(_UTC).replace(tzinfo=None)
    td = value - _EPOCH
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def _check_logical(schema: dict) -> str | None:
    logical = schema.get("logicalType")
    if logical is not None and logical not in _KNOWN_LOGICALS:
        raise ValueError(
            f"unsupported Avro logicalType {logical!r} — refusing to "
            "surface the raw base type as a plausible-looking value"
        )
    return logical


def _decode(schema, buf):
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(
                f"corrupt union branch index {idx} (union has "
                f"{len(schema)} branches)"
            )
        return _decode(schema[idx], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        logical = _check_logical(schema)
        if t in ("int", "long") and logical is not None:
            v = _read_long(buf)
            if logical == "date":
                return _EPOCH_DATE + datetime.timedelta(days=v)
            us = v if logical.endswith("micros") else v * 1000
            ts = _EPOCH + datetime.timedelta(microseconds=us)
            if logical.startswith("timestamp-"):  # spec: UTC instant
                return ts.replace(tzinfo=_UTC)
            return ts  # local-timestamp-*: naive
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)  # block byte size, unused
                for _ in range(n):
                    out.append(_decode(schema["items"], buf))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
        return _decode(t, buf)  # {"type": "long"} wrapper form
    if schema == "null":
        return None
    if schema == "boolean":
        return _read_exact(buf, 1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if schema == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported Avro schema element: {schema!r}")


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union — null branch convention
        null_idx = schema.index("null") if "null" in schema else None
        if value is None:
            if null_idx is None:
                raise ValueError("null value for non-nullable union")
            _write_long(out, null_idx)
            return
        idx = 1 - null_idx if null_idx is not None else 0
        _write_long(out, idx)
        _encode(schema[idx], value, out)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        logical = _check_logical(schema)
        if logical is not None:
            if logical == "date":
                _write_long(out, (value - _EPOCH_DATE).days)
            else:
                us = _micros_since_epoch(value)
                _write_long(
                    out, us if logical.endswith("micros") else us // 1000
                )
            return
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for item in value:
                    _encode(schema["items"], item, out)
            _write_long(out, 0)
            return
        if t == "map":
            # pyarrow surfaces map values as lists of (k, v) pairs
            items = value.items() if isinstance(value, dict) else value
            items = list(items)
            if items:
                _write_long(out, len(items))
                for k, v in items:
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], v, out)
            _write_long(out, 0)
            return
        _encode(t, value, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        _write_bytes(out, bytes(value))
        return
    if schema == "string":
        _write_bytes(out, str(value).encode("utf-8"))
        return
    raise ValueError(f"unsupported Avro schema element: {schema!r}")


# ---------------------------------------------------------------------------
# schema-compiled codecs (hot path)
#
# ``_encode``/``_decode`` above re-interpret the schema dict for every
# field of every row — isinstance chains, dict lookups and logical-type
# probes that cost more than the byte work itself (~1.5 M dynamic
# dispatches per 150 K-row file each way). The container paths instead
# COMPILE the schema once into a tree of closures (one per schema
# node, built per ``emit_ocf``/``parse_ocf_blocks`` call and memoized
# per canonical schema) and run rows through pre-bound functions:
# encoders append to a ``bytearray``, decoders thread an integer
# offset through ``bytes`` — no BytesIO in the row loop. Semantics
# are byte-for-byte those of the interpreted forms (pinned by
# test_compiled_codec_matches_interpreted); the interpreted forms stay
# as the reference implementation and for targeted malformed-input
# tests.
# ---------------------------------------------------------------------------


def _append_long(buf: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while n > 0x7F:
        buf.append((n & 0x7F) | 0x80)
        n >>= 7
    buf.append(n)


def _compile_encoder(schema):
    """schema node → ``enc(value, buf: bytearray)`` closure tree."""
    if isinstance(schema, list):  # union — null branch convention
        null_idx = schema.index("null") if "null" in schema else None
        branch_idx = 1 - null_idx if null_idx is not None else 0
        branch = _compile_encoder(schema[branch_idx])

        def enc_union(value, buf):
            if value is None:
                if null_idx is None:
                    raise ValueError("null value for non-nullable union")
                _append_long(buf, null_idx)
                return
            _append_long(buf, branch_idx)
            branch(value, buf)

        return enc_union
    if isinstance(schema, dict):
        t = schema["type"]
        logical = _check_logical(schema)
        if logical is not None:
            if logical == "date":

                def enc_date(value, buf):
                    _append_long(buf, (value - _EPOCH_DATE).days)

                return enc_date
            micros = logical.endswith("micros")

            def enc_ts(value, buf):
                us = _micros_since_epoch(value)
                _append_long(buf, us if micros else us // 1000)

            return enc_ts
        if t == "record":
            fields = [
                (f["name"], _compile_encoder(f["type"]))
                for f in schema["fields"]
            ]

            def enc_record(value, buf):
                for name, fenc in fields:
                    fenc(value[name], buf)

            return enc_record
        if t == "array":
            item = _compile_encoder(schema["items"])

            def enc_array(value, buf):
                if value:
                    _append_long(buf, len(value))
                    for v in value:
                        item(v, buf)
                buf.append(0)  # zigzag(0) == 0

            return enc_array
        if t == "map":
            val = _compile_encoder(schema["values"])

            def enc_map(value, buf):
                # pyarrow surfaces map values as lists of (k, v) pairs
                items = value.items() if isinstance(value, dict) else value
                items = list(items)
                if items:
                    _append_long(buf, len(items))
                    for k, v in items:
                        kb = k.encode("utf-8")
                        _append_long(buf, len(kb))
                        buf += kb
                        val(v, buf)
                buf.append(0)

            return enc_map
        return _compile_encoder(t)  # {"type": "long"} wrapper form
    if schema == "null":
        return lambda value, buf: None
    if schema == "boolean":

        def enc_bool(value, buf):
            buf.append(1 if value else 0)

        return enc_bool
    if schema in ("int", "long"):

        def enc_long(value, buf):
            _append_long(buf, int(value))

        return enc_long
    if schema == "float":
        packf = struct.Struct("<f").pack

        def enc_float(value, buf):
            buf += packf(float(value))

        return enc_float
    if schema == "double":
        packd = struct.Struct("<d").pack

        def enc_double(value, buf):
            buf += packd(float(value))

        return enc_double
    if schema == "bytes":

        def enc_bytes(value, buf):
            b = bytes(value)
            _append_long(buf, len(b))
            buf += b

        return enc_bytes
    if schema == "string":

        def enc_str(value, buf):
            b = str(value).encode("utf-8")
            _append_long(buf, len(b))
            buf += b

        return enc_str
    raise ValueError(f"unsupported Avro schema element: {schema!r}")


def _dec_long(data, pos: int):
    shift = 0
    acc = 0
    n = len(data)
    while True:
        if pos >= n:
            raise EOFError("truncated varint")
        byte = data[pos]
        pos += 1
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _compile_decoder(schema):
    """schema node → ``dec(data, pos) -> (value, pos)`` closure tree."""
    if isinstance(schema, list):  # union
        branches = [_compile_decoder(b) for b in schema]
        n_branches = len(branches)

        def dec_union(data, pos):
            idx, pos = _dec_long(data, pos)
            if not 0 <= idx < n_branches:
                raise ValueError(
                    f"corrupt union branch index {idx} (union has "
                    f"{n_branches} branches)"
                )
            return branches[idx](data, pos)

        return dec_union
    if isinstance(schema, dict):
        t = schema["type"]
        logical = _check_logical(schema)
        if t in ("int", "long") and logical is not None:
            if logical == "date":

                def dec_date(data, pos):
                    v, pos = _dec_long(data, pos)
                    return _EPOCH_DATE + datetime.timedelta(days=v), pos

                return dec_date
            micros = logical.endswith("micros")
            instant = logical.startswith("timestamp-")

            def dec_ts(data, pos):
                v, pos = _dec_long(data, pos)
                us = v if micros else v * 1000
                ts = _EPOCH + datetime.timedelta(microseconds=us)
                if instant:  # spec: UTC instant
                    return ts.replace(tzinfo=_UTC), pos
                return ts, pos  # local-timestamp-*: naive

            return dec_ts
        if t == "record":
            fields = [
                (f["name"], _compile_decoder(f["type"]))
                for f in schema["fields"]
            ]

            def dec_record(data, pos):
                out = {}
                for name, fdec in fields:
                    out[name], pos = fdec(data, pos)
                return out, pos

            return dec_record
        if t == "array":
            item = _compile_decoder(schema["items"])

            def dec_array(data, pos):
                out = []
                while True:
                    n, pos = _dec_long(data, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        n = -n
                        _, pos = _dec_long(data, pos)  # block bytes, unused
                    for _ in range(n):
                        v, pos = item(data, pos)
                        out.append(v)

            return dec_array
        if t == "map":
            val = _compile_decoder(schema["values"])

            def dec_map(data, pos):
                out = {}
                while True:
                    n, pos = _dec_long(data, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        n = -n
                        _, pos = _dec_long(data, pos)
                    for _ in range(n):
                        ln, pos = _dec_long(data, pos)
                        end = pos + ln
                        if end > len(data):
                            raise EOFError(
                                f"truncated read: wanted {ln}, got "
                                f"{len(data) - pos}"
                            )
                        k = data[pos:end].decode("utf-8")
                        pos = end
                        out[k], pos = val(data, pos)

            return dec_map
        return _compile_decoder(t)  # {"type": "long"} wrapper form
    if schema == "null":
        return lambda data, pos: (None, pos)
    if schema == "boolean":

        def dec_bool(data, pos):
            if pos >= len(data):
                raise EOFError("truncated read: wanted 1, got 0")
            return data[pos] == 1, pos + 1

        return dec_bool
    if schema in ("int", "long"):
        return _dec_long
    if schema == "float":
        unpackf = struct.Struct("<f").unpack_from

        def dec_float(data, pos):
            if pos + 4 > len(data):
                raise EOFError(
                    f"truncated read: wanted 4, got {len(data) - pos}"
                )
            return unpackf(data, pos)[0], pos + 4

        return dec_float
    if schema == "double":
        unpackd = struct.Struct("<d").unpack_from

        def dec_double(data, pos):
            if pos + 8 > len(data):
                raise EOFError(
                    f"truncated read: wanted 8, got {len(data) - pos}"
                )
            return unpackd(data, pos)[0], pos + 8

        return dec_double
    if schema == "bytes":

        def dec_bytes(data, pos):
            n, pos = _dec_long(data, pos)
            end = pos + n
            if end > len(data):
                raise EOFError(
                    f"truncated read: wanted {n}, got {len(data) - pos}"
                )
            return bytes(data[pos:end]), end

        return dec_bytes
    if schema == "string":

        def dec_str(data, pos):
            n, pos = _dec_long(data, pos)
            end = pos + n
            if end > len(data):
                raise EOFError(
                    f"truncated read: wanted {n}, got {len(data) - pos}"
                )
            return data[pos:end].decode("utf-8"), end

        return dec_str
    raise ValueError(f"unsupported Avro schema element: {schema!r}")


_CODEC_CACHE: dict[tuple[str, str], object] = {}


def _cached(kind: str, schema, compile_fn):
    key = (kind, json.dumps(schema, sort_keys=True))
    fn = _CODEC_CACHE.get(key)
    if fn is None:
        fn = _CODEC_CACHE[key] = compile_fn(schema)
    return fn


# ---------------------------------------------------------------------------
# container file parse / emit
# ---------------------------------------------------------------------------


def read_header(buf) -> tuple[dict, str, bytes]:
    """(writer schema, codec, sync marker) from the stream head —
    reads ONLY the header bytes, so driver-side schema inference on a
    multi-GB file touches a few KB."""
    if _read_exact(buf, 4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in _CODECS:
        raise ValueError(
            f"unsupported Avro codec: {codec!r} (supported: "
            f"{sorted(_CODECS)})"
        )
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = _read_exact(buf, 16)
    return schema, codec, sync


def parse_ocf_blocks(data: bytes):
    """(writer schema, iterator of per-block record lists)."""
    buf = io.BytesIO(data)
    schema, codec, sync = read_header(buf)
    dec = _cached("dec", schema, _compile_decoder)

    def blocks():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, io.SEEK_CUR)
            n_obj = _read_long(buf)
            n_bytes = _read_long(buf)
            block = _read_exact(buf, n_bytes)
            block = _CODECS[codec][1](block)
            out = []
            pos = 0
            for _ in range(n_obj):
                rec, pos = dec(block, pos)
                out.append(rec)
            yield out
            if _read_exact(buf, 16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")

    return schema, blocks()


def parse_ocf(data: bytes):
    """(writer schema, iterator of decoded records)."""
    schema, blocks = parse_ocf_blocks(data)
    return schema, (rec for block in blocks for rec in block)


def emit_ocf(schema: dict, rows, codec: str = "deflate") -> bytes:
    """One OCF blob from an iterable of dict rows (single block; a
    zero-row blob is valid and reads back as empty)."""
    if codec not in _CODECS:
        raise ValueError(
            f"unsupported Avro codec: {codec!r} (supported: "
            f"{sorted(_CODECS)})"
        )
    enc = _cached("enc", schema, _compile_encoder)
    body = bytearray()
    n = 0
    for row in rows:
        enc(row, body)
        n += 1
    payload = _CODECS[codec][0](bytes(body))
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = uuid.uuid4().bytes
    out.write(sync)
    if n:
        _write_long(out, n)
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark ↔ Avro ↔ Arrow schema mapping
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _avro_field_type(dt: T.DataType, nullable: bool):
    if isinstance(dt, T.DateType):
        base: object = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, T.TimestampType):
        # spec: timestamp-micros is a UTC INSTANT — TimestampType
        base = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.TimestampNTZType):
        base = {"type": "long", "logicalType": "local-timestamp-micros"}
    elif isinstance(dt, T.ArrayType):
        base = {
            "type": "array",
            "items": _avro_field_type(dt.elementType, dt.containsNull),
        }
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError(
                f"Avro maps require string keys, got {dt.keyType}"
            )
        base = {
            "type": "map",
            "values": _avro_field_type(dt.valueType, dt.valueContainsNull),
        }
    elif isinstance(dt, T.StructType):
        base = _avro_record_schema(dt, name=f"rec_{uuid.uuid4().hex[:8]}")
    elif type(dt) in _SPARK_TO_AVRO:
        base = _SPARK_TO_AVRO[type(dt)]
    else:
        raise ValueError(f"no Avro mapping for Spark type {dt}")
    return ["null", base] if nullable else base


def _avro_record_schema(schema: T.StructType, name: str = "row") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": _avro_field_type(f.dataType, f.nullable),
            }
            for f in schema.fields
        ],
    }


def _spark_type_for(avro_type) -> tuple[T.DataType, bool]:
    """(spark type, nullable) for one Avro field type."""
    if isinstance(avro_type, list):
        branches = [b for b in avro_type if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported union {avro_type!r}")
        dt, _ = _spark_type_for(branches[0])
        return dt, True
    if isinstance(avro_type, dict):
        logical = _check_logical(avro_type)
        if logical == "date":
            return T.DateType(), False
        if logical in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType(), False
        if logical in ("local-timestamp-micros", "local-timestamp-millis"):
            return T.TimestampNTZType(), False
        t = avro_type["type"]
        if t == "record":
            return (
                T.StructType(
                    [
                        T.StructField(f["name"], *_spark_type_for(f["type"]))
                        for f in avro_type["fields"]
                    ]
                ),
                False,
            )
        if t == "array":
            dt, n = _spark_type_for(avro_type["items"])
            return T.ArrayType(dt, n), False
        if t == "map":
            dt, n = _spark_type_for(avro_type["values"])
            return T.MapType(T.StringType(), dt, n), False
        return _spark_type_for(t)
    prim = {
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "null": T.NullType(),
    }
    if avro_type not in prim:
        raise ValueError(f"unsupported Avro type {avro_type!r}")
    return prim[avro_type], False


def _arrow_type(dt: T.DataType):
    import pyarrow as pa

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(_arrow_type(dt.keyType), _arrow_type(dt.valueType))
    if isinstance(dt, T.StructType):
        return pa.struct(
            [(f.name, _arrow_type(f.dataType)) for f in dt.fields]
        )
    raise ValueError(f"no Arrow mapping for Spark type {dt}")


def _arrow_schema(schema: T.StructType):
    import pyarrow as pa

    return pa.schema(
        [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
    )


# ---------------------------------------------------------------------------
# DataFrame read / write
# ---------------------------------------------------------------------------

_HEADER_PROBE_BYTES = 1 << 20  # OCF headers are KBs; 1 MB is generous


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of ``.avro`` OCF files as a DataFrame. The
    Spark schema derives from ONE file's embedded writer schema
    (driver-side HEADER parse — header bytes only, never the file);
    every file then decodes in its own task (``binaryFile`` →
    ``mapInArrow``, one Arrow batch per Avro block, exact types —
    no pandas float coercion). Files whose writer schema disagrees
    raise in-task rather than mis-decoding."""
    import glob as _glob

    first = sorted(
        _glob.glob(os.path.join(path, "*.avro"))
        or _glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
    )
    if not first:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(first[0], "rb") as fh:
        schema, _codec, _sync = read_header(
            io.BytesIO(fh.read(_HEADER_PROBE_BYTES))
        )
    spark_schema = spark_schema_from_avro(schema)
    canonical = json.dumps(schema, sort_keys=True)
    cols = [f.name for f in spark_schema.fields]
    arrow_fields = [
        (f.name, spark_schema[f.name].dataType) for f in spark_schema.fields
    ]

    def decode(batches):
        import pyarrow as pa

        out_schema = pa.schema(
            [(n, _arrow_type(dt)) for n, dt in arrow_fields]
        )
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for p, content in zip(paths, contents):
                s, blocks = parse_ocf_blocks(bytes(content))
                if json.dumps(s, sort_keys=True) != canonical:
                    raise ValueError(
                        f"{p}: writer schema differs from the "
                        "directory's first file"
                    )
                empty = True
                for block in blocks:
                    empty = False
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(
                                [r[n] for r in block], type=out_schema[i].type
                            )
                            for i, n in enumerate(cols)
                        ],
                        schema=out_schema,
                    )
                if empty:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array([], type=out_schema[i].type)
                            for i in range(len(cols))
                        ],
                        schema=out_schema,
                    )

    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return blobs.mapInArrow(decode, spark_schema)


def spark_schema_from_avro(schema: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], *_spark_type_for(f["type"]))
            for f in schema["fields"]
        ]
    )


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", mode: str = "error"
) -> None:
    """Write ``df`` as one OCF file per partition under ``path``. The
    Avro writer schema derives from the DataFrame schema; unsupported
    types raise before any work runs. Rows travel as Arrow batches
    (``to_pylist`` — exact ints, real None for nulls; maps arrive as
    (k, v) pair lists and are encoded per spec). An all-empty frame
    still leaves one zero-row schema-carrying file so the directory
    reads back as an empty DataFrame.

    Failure atomicity (spark-avro SaveMode parity): executors stage
    part files into a SIBLING temp directory, which is installed at
    ``path`` only after the whole job succeeds — a retried/re-run or
    half-failed write can never leave duplicate rows visible under
    the target. ``mode="error"`` (default) refuses an existing
    non-empty target and installs via an EXCLUSIVE single rename (the
    kernel refuses an occupied target — no check-then-install race);
    ``mode="overwrite"`` swaps it out atomically (two-rename
    ``swap_into_place``).

    Deployment constraint: the staging directory is created by the
    DRIVER and part files are ``open()``-ed by EXECUTOR tasks — the
    write path therefore requires a filesystem shared by driver and
    executors (local mode, NFS, HDFS/fuse mounts). Each task probes
    the staging dir and fails fast with a clear error on
    object-store-only clusters (where there is no shared POSIX path);
    there, write to a mounted path or a custom ``StorageBackend``
    whose paths all sides can reach. The READ path has no such
    constraint — ``read_avro`` goes through Spark's ``binaryFile``
    source and works wherever Spark can read."""
    from mpg_data_warehouse_spark.sources.writers import swap_into_place

    if mode not in ("error", "overwrite"):
        raise ValueError(f"write_avro: unknown mode {mode!r}")
    target = os.path.abspath(path)

    def _target_occupied() -> bool:
        # a regular FILE at the target counts too — mode="error" must
        # never let the install path rename pre-existing data away
        if os.path.isdir(target):
            return bool(os.listdir(target))
        return os.path.exists(target)

    if mode == "error" and _target_occupied():
        raise FileExistsError(
            f"write_avro: target {path!r} exists and is non-empty; "
            "pass mode='overwrite' to replace it atomically"
        )
    schema = _avro_record_schema(df.schema)
    staging = f"{target}__stage-{uuid.uuid4().hex}"
    os.makedirs(staging)

    def encode(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        if not os.path.isdir(staging):
            raise RuntimeError(
                f"write_avro: staging dir {staging!r} is not visible "
                "from this executor — the write path requires a "
                "filesystem shared by driver and executors (see "
                "write_avro docstring); reads are unaffected"
            )
        rows: list[dict] = []
        for batch in batches:
            # the frame is projected to exactly ``cols`` and the
            # compiled record encoder reads fields BY NAME, so the
            # to_pylist dicts encode directly — no per-row re-keying
            rows.extend(batch.to_pylist())
        if rows:
            blob = emit_ocf(schema, rows, codec)
            # deterministic per-partition name + atomic rename: a task
            # RETRY overwrites its own file instead of adding a second
            # copy, and concurrent speculative attempts each install a
            # complete blob (last writer wins) — never a partial one
            pid = TaskContext.get().partitionId()
            final = os.path.join(staging, f"part-{pid:05d}.avro")
            tmp = f"{final}.inprogress-{uuid.uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, final)
        yield pa.RecordBatch.from_arrays(
            [pa.array([len(rows)], type=pa.int64())], names=["n"]
        )

    try:
        # one encode task per partition; the aggregate forces execution
        df.mapInArrow(encode, "n long").agg({"n": "sum"}).collect()
        # a task attempt that died between open(tmp) and os.replace
        # leaves its .inprogress file behind — prune before install so
        # the published directory holds only complete blobs
        for name in os.listdir(staging):
            if ".inprogress-" in name:
                os.unlink(os.path.join(staging, name))
        if not any(f.endswith(".avro") for f in os.listdir(staging)):
            with open(os.path.join(staging, "part-empty.avro"), "wb") as fh:
                fh.write(emit_ocf(schema, [], codec))
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    if mode == "error":
        # EXCLUSIVE install: one rename the kernel refuses if the
        # target became occupied while the job ran — no window in
        # which concurrent pre-existing data could be renamed away
        try:
            swap_into_place(staging, target, if_absent=True)
        except FileExistsError:
            shutil.rmtree(staging, ignore_errors=True)
            raise FileExistsError(
                f"write_avro: target {path!r} became non-empty during "
                "the write; nothing was installed"
            ) from None
    else:
        swap_into_place(staging, target)
