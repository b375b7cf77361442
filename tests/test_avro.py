"""Avro container-file codec: spec compliance (byte-level interop with the
JVM org.apache.avro reference implementation on Spark's classpath, BOTH
directions), distributed read path, and full write->read round-trips.

Reference parity: read_avro/register_avro (ballista/client/src/context.rs:
228-234, 317-331)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.context import BallistaSparkContext
from datafusion_ballista_dhruvil_spark.sources.avro_py import (
    avro_schema_for,
    decode_container,
    encode_container,
    read_avro_py,
    write_avro_py,
)

from tests.conftest import SF_DIR


ROWS = [
    (0, "alpha", 1.5, True, None),
    (1, "béta ünïcode", -2.25, False, 7),
    (2, "", 0.0, True, None),
    (3, "x" * 500, 1e300, False, -12345678901234),
]
SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"]},
    ],
}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    blob = encode_container(ROWS, SCHEMA, codec=codec, block_rows=3)
    schema, rows = decode_container(blob)
    assert schema == SCHEMA
    assert rows == ROWS


def test_jvm_reads_our_file(spark, tmp_path):
    """The Avro REFERENCE implementation (avro-1.12.1.jar on Spark's
    classpath) must parse a file this codec wrote — true spec compliance,
    not self-consistency."""
    p = str(tmp_path / "ours.avro")
    with open(p, "wb") as fh:
        fh.write(encode_container(ROWS, SCHEMA, codec="deflate", block_rows=2))
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        got.append(json.loads(str(reader.next())))  # GenericRecord -> JSON
    reader.close()
    assert len(got) == len(ROWS)
    for rec, (i, name, score, flag, opt) in zip(got, ROWS):
        assert rec["id"] == i and rec["name"] == name and rec["flag"] == flag
        assert rec["score"] == score
        assert rec["opt"] == opt


def test_we_read_jvm_file(spark, tmp_path):
    """And the reverse: a file written by the JVM DataFileWriter parses
    here, including its random sync marker and metadata layout."""
    p = str(tmp_path / "jvm.avro")
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(p))
    # build records through Avro's own JSON decoder: py4j re-boxes Python
    # ints as java Integer, which GenericData.Record.put + union resolution
    # rejects; the JSON route keeps typing entirely JVM-side
    datum_reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    for i, name, score, flag, opt in ROWS:
        payload = json.dumps(
            {
                "id": i,
                "name": name,
                "score": score,
                "flag": flag,
                "opt": None if opt is None else {"long": opt},
            }
        )
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
            schema, payload
        )
        writer.append(datum_reader.read(None, dec))
    writer.close()
    with open(p, "rb") as fh:
        schema_read, rows = decode_container(fh.read())
    assert [f["name"] for f in schema_read["fields"]] == [
        f["name"] for f in SCHEMA["fields"]
    ]
    assert rows == ROWS


def test_spark_write_read_roundtrip(spark, tmp_path):
    """Distributed write (per-partition container files) -> distributed
    read (binaryFile + mapInPandas) over the documents table."""
    src = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") < 300)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
    )
    path = str(tmp_path / "docs_avro")
    write_avro_py(src, path, mode="overwrite")
    parts = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(parts) >= 2  # genuinely partitioned output
    back = read_avro_py(spark, path)
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_context_register_avro(spark, tmp_path):
    """register_avro surfaces the fallback reader through the reference's
    context API shape (context.rs:317-331): read, register view, SQL it."""
    src = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "source", "n_chars")
    )
    path = str(tmp_path / "reg_avro")
    write_avro_py(src, path)
    ctx = BallistaSparkContext(spark)
    ctx.register_avro("avro_docs", path)
    got = spark.sql(
        "SELECT source, count(*) AS n, sum(n_chars) AS sc FROM avro_docs "
        "GROUP BY source ORDER BY source"
    ).collect()
    exp = (
        src.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sc"))
        .orderBy("source")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_timestamp_date_logical_types(spark, tmp_path):
    src = spark.sql(
        "SELECT id, timestamp_micros(CAST(id * 1000001 AS BIGINT)) AS ts, "
        "date_add(DATE '2024-01-01', CAST(id AS INT)) AS d "
        "FROM range(5)"
    )
    path = str(tmp_path / "ts_avro")
    write_avro_py(src, path)
    back = read_avro_py(spark, path)
    assert back.schema.simpleString() == src.schema.simpleString()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # the FILE must carry the true epoch micros (tz-independent): timestamps
    # are converted to integers in Spark, never through OS-local datetime
    # objects, so a non-UTC host cannot shift the written instants
    part = next(f for f in sorted(os.listdir(path)) if f.endswith(".avro"))
    with open(os.path.join(path, part), "rb") as fh:
        _, rows = decode_container(fh.read())
    import datetime as dt

    for _id, ts, _d in (tuple(r) for r in rows):
        micros = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        assert micros == _id * 1000001
