"""Avro codec spec conformance (io/avro_codec.py).

The container-file roundtrip query (io_avro_roundtrip) exercises
encode→decode end-to-end, but a symmetric bug would survive a
self-roundtrip — so these tests pin the BINARY ENCODING against
hand-computed vectors from the public Avro 1.12 spec (zigzag varints,
IEEE little-endian doubles, length-prefixed UTF-8, union branch
indices), plus the container framing (magic, metadata map, sync).
"""

from __future__ import annotations

import struct

from supabase_etl_spark.io.avro_codec import (
    MAGIC,
    decode_file,
    decode_header,
    encode_records,
    zigzag_decode,
    zigzag_encode,
)

# spec §"Primitive types: long": zigzag + base-128 varint examples —
# the exact table from the specification document
SPEC_LONG_VECTORS = [
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
    (8192, b"\x80\x80\x01"),
    (-8193, b"\x81\x80\x01"),
]


def test_zigzag_spec_vectors():
    for n, raw in SPEC_LONG_VECTORS:
        assert zigzag_encode(n) == raw, f"encode({n})"
        got, pos = zigzag_decode(raw, 0)
        assert (got, pos) == (n, len(raw)), f"decode({raw!r})"


def test_zigzag_64bit_extremes():
    for n in (2**63 - 1, -(2**63), 123456789012345, -123456789012345):
        got, _ = zigzag_decode(zigzag_encode(n), 0)
        assert got == n


def test_record_body_bytes_match_spec():
    """One record {a: 3 (long), b: "hi"} under all-nullable unions:
    each field is union-index zigzag(1)=\\x02 then the value; long 3
    encodes as zigzag -> 6 -> \\x06; string "hi" is length
    zigzag(2)=\\x04 + UTF-8 bytes. A null writes only the union index
    zigzag(0)=\\x00."""
    fields = [("a", "long"), ("b", "string")]
    data = encode_records(fields, [(3, "hi"), (None, None)])
    _fields, sync, pos = decode_header(data)
    assert data[:4] == MAGIC
    # block: count=2 -> \x04, then size varint, then the two records
    assert data[pos : pos + 1] == b"\x04"
    body_expected = (
        b"\x02\x06"  # a: union branch 1, long 3
        b"\x02\x04hi"  # b: union branch 1, len 2, "hi"
        b"\x00\x00"  # second record: both nulls
    )
    assert body_expected in data[pos:]
    assert data.endswith(sync)


def test_double_is_ieee_little_endian():
    fields = [("x", "double")]
    data = encode_records(fields, [(1.5,)])
    assert b"\x02" + struct.pack("<d", 1.5) in data


def test_container_roundtrip_all_types_and_blocks():
    fields = [
        ("b", "boolean"),
        ("i", "int"),
        ("l", "long"),
        ("f", "float"),
        ("d", "double"),
        ("s", "string"),
        ("y", "bytes"),
    ]
    rows = [
        (True, -5, 2**40, 0.5, -2.25, "héllo", b"\x00\xff"),
        (None, None, None, None, None, None, None),
        (False, 0, -1, 1.0, 0.0, "", b""),
    ] * 100  # spans multiple 4096-record... keep one block but many rows
    data = encode_records(fields, rows, block_size=7)  # force many blocks
    got_fields, got_rows = decode_file(data)
    assert got_fields == fields
    assert len(got_rows) == len(rows)
    assert got_rows[0][0] is True
    assert got_rows[0][2] == 2**40
    assert got_rows[0][5] == "héllo"
    assert got_rows[0][6] == b"\x00\xff"
    assert got_rows[1] == (None,) * 7
    # float is 32-bit: 0.5 survives exactly
    assert got_rows[0][3] == 0.5


def test_corrupt_sync_detected():
    fields = [("a", "long")]
    data = bytearray(encode_records(fields, [(1,), (2,)]))
    data[-1] ^= 0xFF  # damage the trailing sync
    try:
        decode_file(bytes(data))
        raise AssertionError("corrupt sync not detected")
    except ValueError as e:
        assert "sync" in str(e)
