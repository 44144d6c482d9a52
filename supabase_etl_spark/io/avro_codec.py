"""Pure-Python Avro Object Container File codec (documented subset).

Why this exists: SURVEY §2.2 declares an Avro scan/sink, but this
runtime ships neither the spark-avro connector jar nor any Python avro
library, and package installs are gated — so ``.format("avro")`` can
never run here. Rather than leave the cell permanently gated, the
engine implements the container format itself for FLAT record schemas
of primitive types, per the public Avro 1.12 specification
(https://avro.apache.org/docs/1.12.0/specification/):

- Object Container File framing: magic ``Obj\\x01``, file metadata map
  (``avro.schema`` JSON + ``avro.codec: null``), 16-byte sync marker,
  then blocks of ``(record count, byte size, records..., sync)``.
- Binary encoding: zigzag-varint longs/ints, little-endian IEEE
  float/double, length-prefixed UTF-8 strings/bytes, 1-byte booleans.
- Every field is the nullable union ``["null", T]`` (union index
  prefix per record field), matching Spark's nullable columns.

Subset limits (asserted, not silent): primitive field types only —
boolean, int, long, float, double, string, bytes. No nested records,
arrays, maps, enums, logical types, or compression codecs. The
encoding is validated against hand-computed spec test vectors in
tests/test_avro_codec.py, not just self-roundtrip, so a symmetric
encode/decode bug cannot hide.

The Spark-side plumbing (io/writers.write_avro, readers-side
read_avro) is fully distributed: encode runs per partition via
mapInPandas, decode reads the files through the binaryFile source and
decodes per file — no driver-side data path.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct

MAGIC = b"Obj\x01"

# Spark simpleString -> (avro type, encoder key)
SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}
AVRO_TO_SPARK = {v: k for k, v in SPARK_TO_AVRO.items()}


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(typ: str, v) -> bytes:
    if typ == "long" or typ == "int":
        return zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return zigzag_encode(len(raw)) + raw
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported avro type {typ}")


def _decode_value(typ: str, buf: bytes, pos: int):
    if typ == "long" or typ == "int":
        return zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "string":
        n, pos = zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported avro type {typ}")


def avro_schema_json(fields: list[tuple[str, str]], name: str = "record0") -> str:
    """fields: [(name, avro primitive type)]; every field nullable."""
    for _, t in fields:
        if t not in AVRO_TO_SPARK:
            raise ValueError(f"unsupported avro type {t}")
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": ["null", t]} for n, t in fields],
        }
    )


def _sync_marker(schema_json: str) -> bytes:
    # spec wants a unique-per-file marker; deterministic-from-schema is
    # valid (uniqueness matters only for splitting concatenated files)
    return hashlib.md5(schema_json.encode()).digest()


def encode_records(
    fields: list[tuple[str, str]], records, block_size: int = 4096
) -> bytes:
    """Serialize an iterable of tuples/lists to one container file."""
    schema_json = avro_schema_json(fields)
    sync = _sync_marker(schema_json)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    out.write(zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(zigzag_encode(len(kb)) + kb)
        out.write(zigzag_encode(len(v)) + v)
    out.write(zigzag_encode(0))  # end of metadata map
    out.write(sync)

    buf = bytearray()
    count = 0

    def flush():
        nonlocal buf, count
        if count:
            out.write(zigzag_encode(count))
            out.write(zigzag_encode(len(buf)))
            out.write(bytes(buf))
            out.write(sync)
            buf = bytearray()
            count = 0

    for rec in records:
        for (fname, ftype), v in zip(fields, rec):
            if v is None:
                buf += zigzag_encode(0)  # union branch 0: null
            else:
                buf += zigzag_encode(1)  # union branch 1: the type
                buf += _encode_value(ftype, v)
        count += 1
        if count >= block_size:
            flush()
    flush()
    return out.getvalue()


def decode_header(data: bytes) -> tuple[list[tuple[str, str]], bytes, int]:
    """Parse just the container header -> (fields, sync marker, pos of
    first block). Needs only the first few KB of the file, so a driver
    schema probe never reads data blocks."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _, pos = zigzag_decode(data, pos)
        for _ in range(n):
            klen, pos = zigzag_decode(data, pos)
            k = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = zigzag_decode(data, pos)
            meta[k] = data[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", T]
            t = next(x for x in t if x != "null")
        fields.append((f["name"], t))
    sync = data[pos : pos + 16]
    pos += 16
    return fields, sync, pos


def decode_file(data: bytes) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Parse one container file -> (fields, records)."""
    fields, sync, pos = decode_header(data)

    records: list[tuple] = []
    while pos < len(data):
        count, pos = zigzag_decode(data, pos)
        _size, pos = zigzag_decode(data, pos)
        for _ in range(count):
            rec = []
            for _, ftype in fields:
                branch, pos = zigzag_decode(data, pos)
                if branch == 0:
                    rec.append(None)
                else:
                    v, pos = _decode_value(ftype, data, pos)
                    rec.append(v)
            records.append(tuple(rec))
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return fields, records
