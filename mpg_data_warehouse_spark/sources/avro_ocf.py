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
no Spark builtin expresses, so it lives behind the engine's standard
Arrow boundary — ``binaryFile`` scan → ``mapInPandas`` decode —
exactly like the multimodal codecs (``operators/multimodal.py``).
On a cluster with spark-avro available, swap
``spark.read.format("avro")`` in; the schemas match.

Scale shape: one Avro file = one task (binaryFile splits at file
granularity; OCF files are written file-per-partition, so
parallelism follows the layout). Decode is streamed block-by-block
per file; memory is bounded by one decompressed block. The writer
emits one OCF per partition directly to the target directory with a
task-unique name (same shared-filesystem contract as the txlog
format; an object-store deployment routes the byte blobs through its
own put).

Supported types (the warehouse's surface): null, boolean, int, long,
float, double, string, bytes, records, arrays, maps, 2-branch null
unions (nullable columns), and the date / timestamp-micros /
timestamp-millis logical types. Codecs: null and deflate (stdlib
zlib). Unsupported schema features raise loudly — never silently
mis-decode.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary primitives (Avro spec §"Binary encoding")
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
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


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------
# schema-driven decode / encode
# ---------------------------------------------------------------------------


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if t in ("int", "long") and logical in (
            "date",
            "timestamp-micros",
            "timestamp-millis",
        ):
            import datetime

            v = _read_long(buf)
            if logical == "date":
                return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
            # exact integer arithmetic: float-seconds conversion loses
            # microseconds once the value nears 2^53
            us = v if logical == "timestamp-micros" else v * 1000
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=us
            )
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
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
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
        logical = schema.get("logicalType")
        if logical in ("date", "timestamp-micros", "timestamp-millis"):
            import datetime

            if logical == "date":
                _write_long(out, (value - datetime.date(1970, 1, 1)).days)
            else:
                td = value - datetime.datetime(1970, 1, 1)
                us = (
                    td.days * 86_400_000_000
                    + td.seconds * 1_000_000
                    + td.microseconds
                )
                _write_long(
                    out,
                    us if logical == "timestamp-micros" else us // 1000,
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
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
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
# container file parse / emit
# ---------------------------------------------------------------------------


def parse_ocf(data: bytes):
    """(schema dict, iterator of decoded records) for one OCF blob."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
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
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)

    def records():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, io.SEEK_CUR)
            n_obj = _read_long(buf)
            n_bytes = _read_long(buf)
            block = buf.read(n_bytes)
            if codec == "deflate":
                block = zlib.decompress(block, -15)  # raw DEFLATE per spec
            bbuf = io.BytesIO(block)
            for _ in range(n_obj):
                yield _decode(schema, bbuf)
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")

    return schema, records()


def emit_ocf(schema: dict, rows, codec: str = "deflate") -> bytes:
    """One OCF blob from an iterable of dict rows (single block)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec!r}")
    body = io.BytesIO()
    n = 0
    for row in rows:
        _encode(schema, row, body)
        n += 1
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
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
    _write_long(out, n)
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark ↔ Avro schema mapping
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
    elif isinstance(dt, T.TimestampType | T.TimestampNTZType):
        base = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.ArrayType):
        base = {
            "type": "array",
            "items": _avro_field_type(dt.elementType, dt.containsNull),
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
        logical = avro_type.get("logicalType")
        if logical == "date":
            return T.DateType(), False
        if logical in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampNTZType(), False
        t = avro_type["type"]
        if t == "record":
            return (
                T.StructType(
                    [
                        T.StructField(
                            f["name"], *_spark_type_for(f["type"])[::1]
                        )
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


def spark_schema_from_avro(schema: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], *_spark_type_for(f["type"]))
            for f in schema["fields"]
        ]
    )


# ---------------------------------------------------------------------------
# DataFrame read / write
# ---------------------------------------------------------------------------


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of ``.avro`` OCF files as a DataFrame. The
    Spark schema derives from ONE file's embedded writer schema
    (driver-side header parse); every file is then decoded in its own
    task (``binaryFile`` → ``mapInPandas``, Arrow-batched rows out).
    Files whose schema disagrees raise in-task rather than
    mis-decoding."""
    import glob as _glob

    first = sorted(
        _glob.glob(os.path.join(path, "*.avro"))
        or _glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
    )
    if not first:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(first[0], "rb") as fh:
        head = fh.read()
    schema, _ = parse_ocf(head)
    spark_schema = spark_schema_from_avro(schema)
    canonical = json.dumps(schema, sort_keys=True)
    cols = [f.name for f in spark_schema.fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                s, recs = parse_ocf(bytes(row["content"]))
                if json.dumps(s, sort_keys=True) != canonical:
                    raise ValueError(
                        f"{row['path']}: writer schema differs from "
                        "the directory's first file"
                    )
                out = list(recs)
                yield pd.DataFrame(
                    {c: [r[c] for r in out] for c in cols}
                ) if out else pd.DataFrame({c: [] for c in cols})

    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return blobs.mapInPandas(decode, spark_schema)


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate"
) -> None:
    """Write ``df`` as one OCF file per partition under ``path``
    (shared-filesystem contract, like the txlog format; an
    object-store deployment routes the blobs through its own put).
    The Avro writer schema derives from the DataFrame schema;
    unsupported types raise before any work runs."""
    schema = _avro_record_schema(df.schema)
    os.makedirs(path, exist_ok=True)
    spark_schema = df.schema
    cols = [f.name for f in spark_schema.fields]

    def encode(batches):
        import numpy as np
        import pandas as pd

        def norm(v):
            # Arrow hands arrays as numpy ndarrays and nulls as
            # NaN/NaT/None; normalize to plain python for the encoder
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, (list, dict, bytes, bytearray)):
                return v
            if v is None:
                return None
            try:
                if pd.isna(v):
                    return None
            except (TypeError, ValueError):
                pass
            return v

        rows: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict(orient="records"):
                rows.append({c: norm(rec[c]) for c in cols})
        if rows:
            blob = emit_ocf(schema, rows, codec)
            name = f"part-{uuid.uuid4().hex}.avro"
            with open(os.path.join(path, name), "wb") as fh:
                fh.write(blob)
        yield pd.DataFrame({"n": [len(rows)]})

    # one encode task per partition; the count output forces execution
    df.mapInPandas(encode, "n long").agg({"n": "sum"}).collect()
