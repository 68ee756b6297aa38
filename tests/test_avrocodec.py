"""Round-trip proofs for the stdlib Avro OCF codec (operators/avrocodec)
and its Python Data Source plumbing (sources/avro_source) — the same
writer/parser round-trip discipline as the PDF/PNG/RIFF codecs, which is
what lets io_avro_roundtrip carry a full value oracle."""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crocus_spark.operators.avrocodec import (
    MAGIC,
    decode_ocf,
    encode_ocf,
    iter_ocf_records,
    parse_ocf_header,
)

REC = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
    ],
}


def _recs(n):
    return [
        {"k": i, "s": None if i % 3 == 0 else "x" * (i % 7), "d": i / 7.0}
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_basic(codec):
    data = encode_ocf(_recs(100), REC, codec=codec, records_per_block=16)
    assert data[:4] == MAGIC
    schema, back = decode_ocf(data)
    assert schema == REC
    assert back == _recs(100)


def test_deflate_actually_compresses():
    recs = [{"k": 1, "s": "abc" * 50, "d": 0.5}] * 500
    raw = encode_ocf(recs, REC, codec="null")
    packed = encode_ocf(recs, REC, codec="deflate")
    assert len(packed) < len(raw) / 5
    assert decode_ocf(packed)[1] == recs


def test_fail_loud_on_corruption():
    data = encode_ocf(_recs(10), REC)
    with pytest.raises(ValueError, match="bad magic"):
        decode_ocf(b"XXXX" + data[4:])
    with pytest.raises(ValueError, match="truncated block"):
        list(iter_ocf_records(data[:-3]))
    # flip a sync byte: torn block must raise, never return short
    schema, codec, sync, pos = parse_ocf_header(data)
    idx = data.rindex(sync)
    torn = data[:idx] + bytes([data[idx] ^ 0xFF]) + data[idx + 1 :]
    with pytest.raises(ValueError, match="sync marker mismatch"):
        list(iter_ocf_records(torn))
    with pytest.raises(ValueError, match="unsupported codec"):
        encode_ocf(_recs(1), REC, codec="snappy")


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.one_of(st.none(), st.text(max_size=40)),
            st.floats(allow_nan=False),
        ),
        max_size=60,
    )
)
def test_roundtrip_property(rows):
    recs = [{"k": k, "s": s, "d": d} for k, s, d in rows]
    _schema, back = decode_ocf(encode_ocf(recs, REC, records_per_block=7))
    assert back == recs


def test_complex_types_roundtrip():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": {"type": "array", "items": "float"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "b", "type": ["null", "bytes"]},
            {"name": "flag", "type": "boolean"},
        ],
    }
    recs = [
        {"a": [1.5, -0.25], "m": {"x": 1, "y": -2}, "b": b"\x00\xff", "flag": True},
        {"a": [], "m": {}, "b": None, "flag": False},
    ]
    _s, back = decode_ocf(encode_ocf(recs, schema))
    # floats narrow to float32 on the wire — compare through the cast
    exp = [
        dict(
            r,
            a=[struct.unpack("<f", struct.pack("<f", x))[0] for x in r["a"]],
        )
        for r in recs
    ]
    assert back == exp


# ---------------------------------------------------------------------------
# Schema mapping + Spark Data Source round-trip
# ---------------------------------------------------------------------------


def test_schema_mapping_inverse():
    from pyspark.sql import types as T

    from crocus_spark.sources.avro_source import (
        avro_schema_to_spark,
        spark_schema_to_avro,
    )

    st_ = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("day", T.DateType(), True),
            T.StructField("vec", T.ArrayType(T.FloatType(), False), True),
            T.StructField("raw", T.BinaryType(), True),
        ]
    )
    avro = spark_schema_to_avro(st_)
    assert avro["fields"][0]["type"] == "long"  # non-nullable: no union
    assert avro["fields"][1]["type"] == ["null", "string"]
    back = avro_schema_to_spark(avro)
    assert back == st_


def test_datasource_roundtrip_typed(spark, tmp_path):
    """Write → read through the registered source: timestamps
    microsecond-exact, dates exact, arrays exact, nulls preserved."""
    from crocus_spark.sources import register_avro_sink, register_avro_source

    register_avro_sink(spark)
    register_avro_source(spark)
    rows = [
        (
            1,
            "a",
            datetime(2024, 3, 1, 12, 34, 56, 789123),
            date(2024, 2, 29),
            [1.5, -2.25],
        ),
        (2, None, datetime(1969, 12, 31, 23, 59, 59, 1), None, []),
    ]
    ddl = (
        "k long, s string, ts timestamp, day date, vec array<float>"
    )
    df = spark.createDataFrame(rows, ddl)
    path = str(tmp_path / "avro_out")
    df.write.format("crocus_avro_sink").option("path", path).mode(
        "append"
    ).save()
    back = spark.read.format("crocus_avro").option("path", path).load()
    assert back.schema == df.schema
    got = sorted([tuple(r) for r in back.collect()])
    assert got == rows


def test_sink_reappend_does_not_clobber(spark, tmp_path):
    """A second append batch to the same directory must extend it, not
    overwrite part-00000 (index-only naming silently clobbered)."""
    from crocus_spark.sources import register_avro_sink, register_avro_source

    register_avro_sink(spark)
    register_avro_source(spark)
    path = str(tmp_path / "landing")
    a = spark.range(0, 10).selectExpr("id AS k")
    b = spark.range(100, 110).selectExpr("id AS k")
    a.repartition(2).write.format("crocus_avro_sink").option(
        "path", path
    ).mode("append").save()
    b.repartition(2).write.format("crocus_avro_sink").option(
        "path", path
    ).mode("append").save()
    back = spark.read.format("crocus_avro").option("path", path).load()
    got = sorted(r.k for r in back.collect())
    assert got == list(range(0, 10)) + list(range(100, 110))


def test_sink_naming_survives_directory_gaps(spark, tmp_path):
    """r7 ADVICE: the commit base must be max(existing part index)+1,
    never a file COUNT — after an external deletion punches a gap,
    count < max+1 and count-based naming would os.replace straight
    over a committed part."""
    import os

    from crocus_spark.sources import register_avro_sink, register_avro_source

    register_avro_sink(spark)
    register_avro_source(spark)
    path = str(tmp_path / "gappy")
    a = spark.range(0, 10).selectExpr("id AS k")
    a.repartition(2).write.format("crocus_avro_sink").option(
        "path", path
    ).mode("append").save()
    assert sorted(os.listdir(path)) == ["part-00000.avro", "part-00001.avro"]
    survivor = os.path.join(path, "part-00001.avro")
    with open(survivor, "rb") as f:
        survivor_bytes = f.read()
    os.remove(os.path.join(path, "part-00000.avro"))  # the gap
    b = spark.range(100, 110).selectExpr("id AS k")
    b.repartition(2).write.format("crocus_avro_sink").option(
        "path", path
    ).mode("append").save()
    # new parts named PAST the survivor; survivor's bytes untouched
    assert sorted(os.listdir(path)) == [
        "part-00001.avro", "part-00002.avro", "part-00003.avro",
    ]
    with open(survivor, "rb") as f:
        assert f.read() == survivor_bytes
    got = sorted(
        r.k
        for r in spark.read.format("crocus_avro")
        .option("path", path).load().collect()
    )
    # part-00000's rows are gone (external delete), batch b fully there
    assert got[-10:] == list(range(100, 110))


def test_sink_honors_overwrite_mode(spark, tmp_path):
    """r7 ADVICE: mode('overwrite') must truncate the committed parts,
    not silently append — silent duplication is worse than an error."""
    import os

    from crocus_spark.sources import register_avro_sink, register_avro_source

    register_avro_sink(spark)
    register_avro_source(spark)
    path = str(tmp_path / "ow")
    spark.range(0, 10).selectExpr("id AS k").write.format(
        "crocus_avro_sink"
    ).option("path", path).mode("append").save()
    spark.range(500, 503).selectExpr("id AS k").repartition(1).write.format(
        "crocus_avro_sink"
    ).option("path", path).mode("overwrite").save()
    assert sorted(os.listdir(path)) == ["part-00000.avro"]
    got = sorted(
        r.k
        for r in spark.read.format("crocus_avro")
        .option("path", path).load().collect()
    )
    assert got == [500, 501, 502]


def test_next_part_index_unit():
    """Gap-proof and noise-proof: max+1 over parsable part stems; files
    with the extension but foreign stems can't collide so they don't
    move the max."""
    import os
    import tempfile

    from crocus_spark.sources.sink_naming import next_part_index

    with tempfile.TemporaryDirectory() as d:
        assert next_part_index(d, ".avro") == 0
        for name in (
            "part-00000.avro", "part-00007.avro", "foreign.avro",
            "part-xx.avro", ".tmp-abc.avro", "part-00003.json",
        ):
            open(os.path.join(d, name), "wb").close()
        assert next_part_index(d, ".avro") == 8
        assert next_part_index(d, ".json") == 4
