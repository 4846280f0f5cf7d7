"""Minimal KPL (Kinesis Producer Library) aggregate-record codec.

Implements the public KPL aggregation format (documented in
awslabs/amazon-kinesis-producer `aggregation-format.md`): a 4-byte magic
prefix ``F3 89 9A C2``, a protobuf ``AggregatedRecord`` message, and a
16-byte MD5 checksum of the protobuf payload.

The reference pipeline deaggregates these via the ``aws-kinesis-agg``
dependency (reference lambda/requirements.txt:3, consumed at
lambda/main.py:89). We implement the wire format directly (hand-rolled
varint protobuf for exactly the three message types involved) so the
engine has no non-public dependencies; the encoder exists for tests.

    message AggregatedRecord {
      repeated string partition_key_table    = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records                 = 3;
    }
    message Record {
      required uint64 partition_key_index     = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                    = 3;
    }
"""

from __future__ import annotations

import hashlib

KPL_MAGIC = b"\xf3\x89\x9a\xc2"


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _field(tag: int, wire: int) -> bytes:
    return _write_varint((tag << 3) | wire)


def encode_aggregate(user_records: list[bytes], partition_key: str = "pk") -> bytes:
    """Build a KPL aggregate blob from user-record payloads (for tests)."""
    pk = partition_key.encode()
    body = _field(1, 2) + _write_varint(len(pk)) + pk
    for data in user_records:
        rec = _field(1, 0) + _write_varint(0)  # partition_key_index = 0
        rec += _field(3, 2) + _write_varint(len(data)) + data
        body += _field(3, 2) + _write_varint(len(rec)) + rec
    return KPL_MAGIC + body + hashlib.md5(body).digest()


def is_aggregate(blob: bytes) -> bool:
    return len(blob) > 20 and blob[:4] == KPL_MAGIC


def decode_aggregate(blob: bytes) -> list[bytes]:
    """Split a KPL aggregate into user-record payloads. Raises ValueError
    on malformed input (caller decides drop-vs-passthrough policy)."""
    if not is_aggregate(blob):
        raise ValueError("not a KPL aggregate")
    body, checksum = blob[4:-16], blob[-16:]
    if hashlib.md5(body).digest() != checksum:
        raise ValueError("KPL checksum mismatch")
    records: list[bytes] = []
    pos = 0
    while pos < len(body):
        key, pos = _read_varint(body, pos)
        tag, wire = key >> 3, key & 7
        if wire == 2:
            length, pos = _read_varint(body, pos)
            payload = body[pos : pos + length]
            pos += length
            if tag == 3:  # Record
                records.append(_decode_record_data(payload))
        elif wire == 0:
            _, pos = _read_varint(body, pos)
        else:
            raise ValueError(f"unexpected wire type {wire}")
    return records


def _decode_record_data(rec: bytes) -> bytes:
    pos = 0
    data = b""
    while pos < len(rec):
        key, pos = _read_varint(rec, pos)
        tag, wire = key >> 3, key & 7
        if wire == 2:
            length, pos = _read_varint(rec, pos)
            if tag == 3:  # data
                data = rec[pos : pos + length]
            pos += length
        elif wire == 0:
            _, pos = _read_varint(rec, pos)
        else:
            raise ValueError(f"unexpected wire type {wire}")
    return data
