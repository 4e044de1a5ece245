"""Pure-Python Snappy block format — enough to make Avro's
``snappy`` codec a real compatibility surface with no native
library.

Why this exists: Kafka→Avro pipelines overwhelmingly write
snappy-compressed Object Container Files, and this environment has
no ``python-snappy``/``cramjam``. The block format is public and
small (github.com/google/snappy/blob/main/format_description.txt):
a varint uncompressed length followed by tagged elements — 2-bit
tag types 00 literal / 01 copy-1-byte-offset / 10 copy-2 / 11
copy-4. A full DECODER is ~60 lines, which makes foreign snappy
Avro files readable here.

The ENCODER emits literal-only streams: a stream of maximal literal
elements is valid Snappy by construction (the reference decoder
accepts it — compression is an encoder's choice, not a format
requirement), so files written here decode with any real snappy
library; they just aren't compressed. Callers who want actual
compression on write use deflate/bzip2/xz; ``snappy`` write support
exists for pipelines whose READERS demand that codec name.
"""

from __future__ import annotations

__all__ = ["decompress", "compress_literal"]


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        # 32-bit length fits in 5 varint bytes (shifts 0..28); a
        # continuation bit on the 5th byte is already malformed
        if shift >= 35:
            raise ValueError("snappy: varint too long")


def decompress(data: bytes, max_length: int | None = None) -> bytes:
    """Decode one Snappy block-format stream.

    The output is bounded as it grows: any element that would push the
    decoded size past the header-declared length fails IMMEDIATELY, so
    a malformed/hostile stream (5-byte copy tags emit up to 64 bytes
    each, ~32x amplification) cannot materialize more than ``want``
    bytes before the error. ``max_length`` additionally caps the
    header-declared length itself for callers decoding untrusted data.
    """
    want, pos = _read_varint(data, 0)
    if max_length is not None and want > max_length:
        raise ValueError(
            f"snappy: declared length {want} exceeds cap {max_length}"
        )
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        ttype = tag & 0b11
        if ttype == 0b00:  # literal
            ln = tag >> 2
            pos += 1
            if ln >= 60:  # length in next 1-4 bytes, little-endian
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos:pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            if len(out) + ln > want:
                raise ValueError("snappy: output exceeds declared length")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if ttype == 0b01:  # copy, 1-byte offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-1")
            ln = ((tag >> 2) & 0b111) + 4
            offset = ((tag >> 5) << 8) | data[pos + 1]
            pos += 2
        elif ttype == 0b10:  # copy, 2-byte offset
            if pos + 3 > n:
                raise ValueError("snappy: truncated copy-2")
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos + 1:pos + 3], "little")
            pos += 3
        else:  # copy, 4-byte offset
            if pos + 5 > n:
                raise ValueError("snappy: truncated copy-4")
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos + 1:pos + 5], "little")
            pos += 5
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        if len(out) + ln > want:
            raise ValueError("snappy: output exceeds declared length")
        # copies may OVERLAP the output head (offset < length is the
        # RLE idiom) — byte-at-a-time semantics, chunked per offset
        start = len(out) - offset
        while ln > 0:
            take = min(ln, offset)
            out += out[start:start + take]
            start += take
            ln -= take
    if len(out) != want:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, header promised {want}"
        )
    return bytes(out)


def compress_literal(data: bytes) -> bytes:
    """Encode ``data`` as a valid literal-only Snappy stream."""
    out = bytearray()
    n = len(data)
    acc = n
    while True:  # varint of uncompressed length
        b = acc & 0x7F
        acc >>= 7
        out.append(b | 0x80 if acc else b)
        if not acc:
            break
    pos = 0
    max_chunk = 1 << 16  # any bound works; 64 KiB keeps tags 2-byte
    while pos < n:
        chunk = data[pos:pos + max_chunk]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out += ln.to_bytes(1, "little")
        elif ln < (1 << 16):
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        else:  # pragma: no cover - max_chunk keeps lengths ≤ 16 bit
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)
