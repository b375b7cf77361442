"""Pure-Python Avro Object Container File codec + distributed Spark reader.

Reference parity: ``read_avro`` / ``register_avro``
(ballista/client/src/context.rs:228-234, 317-331). This container ships the
Avro *core* jars (avro-1.12.1) but not the ``spark-avro`` DataSource module
and has no network to fetch it, so the format would otherwise be a gated
error. Instead this module implements the Avro 1.x container spec
(https://avro.apache.org/docs/current/specification/) directly:

- header: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker;
- blocks: zigzag-varint (count, serialized-size), payload, sync marker;
- codecs: ``null`` and ``deflate`` (raw zlib, -15 window);
- types: null/boolean/int/long/float/double/bytes/string, records thereof,
  2-branch ``["null", T]`` unions (nullable columns), and the
  ``timestamp-micros`` / ``date`` logical types Spark maps to.

Spec compliance is asserted the strong way in tests/test_avro.py: files
written here are read back by the JVM ``org.apache.avro`` DataFileReader on
Spark's classpath, and files written by the JVM DataFileWriter are read
here — byte-level interop in both directions, not self-consistency.

Scale posture: the READ path is distributed — ``binaryFile`` lists and
assigns whole files to tasks, decode runs in ``mapInPandas`` (one Python
pass per file, Arrow batches out), so a directory of N files reads with
N-way parallelism. Finer-than-file splits (Avro blocks are sync-delimited
precisely so readers can split them) and zero-copy decode belong to the
real spark-avro module — on a cluster with jar access, add
``org.apache.spark:spark-avro_2.13`` and sources/readers.py::read_avro
uses it automatically; this codec is the jar-less fallback.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes is legal)

# ---------------------------------------------------------------------------
# primitive codec
# ---------------------------------------------------------------------------


def write_long(buf: io.BytesIO, n: int) -> None:
    # zigzag then base-128 varint, little-endian groups
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def _write_str(buf: io.BytesIO, s: str) -> None:
    _write_bytes(buf, s.encode("utf-8"))


# ---------------------------------------------------------------------------
# schema mapping (Spark <-> Avro)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
}


def avro_schema_for(df: DataFrame, name: str = "row") -> dict:
    """Avro record schema for a DataFrame of primitive columns — the same
    mapping spark-avro applies (timestamp -> long/timestamp-micros,
    date -> int/date, nullable -> ["null", T])."""
    fields = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        if tn in _SPARK_TO_AVRO:
            at: object = _SPARK_TO_AVRO[tn]
        elif tn == "timestamp":
            at = {"type": "long", "logicalType": "timestamp-micros"}
        elif tn == "date":
            at = {"type": "int", "logicalType": "date"}
        else:
            raise ValueError(f"unsupported column type for avro writer: {tn}")
        if f.nullable:
            at = ["null", at]
        fields.append({"name": f.name, "type": at})
    return {"type": "record", "name": name, "fields": fields}


def _spark_type_of(avro_type: object) -> str:
    if isinstance(avro_type, list):  # ["null", T]
        branches = [t for t in avro_type if t != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported union: {avro_type}")
        return _spark_type_of(branches[0])
    if isinstance(avro_type, dict):
        lt = avro_type.get("logicalType")
        if lt == "timestamp-micros":
            return "timestamp"
        if lt == "date":
            return "date"
        return _spark_type_of(avro_type["type"])
    return {
        "long": "long",
        "int": "int",
        "string": "string",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
        "bytes": "binary",
    }[avro_type]  # type: ignore[index]


def spark_ddl_for(schema: dict) -> str:
    """Spark DDL schema string for an Avro record schema."""
    return ", ".join(
        f"{f['name']} {_spark_type_of(f['type'])}" for f in schema["fields"]
    )


# ---------------------------------------------------------------------------
# datum encode / decode
# ---------------------------------------------------------------------------


def _encode_datum(buf: io.BytesIO, v: object, at: object) -> None:
    if isinstance(at, list):  # nullable union: branch index then datum
        if v is None:
            write_long(buf, at.index("null"))
            return
        branch = next(i for i, t in enumerate(at) if t != "null")
        write_long(buf, branch)
        _encode_datum(buf, v, at[branch])
        return
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-micros":
            if hasattr(v, "timestamp"):
                import datetime as _dt

                naive = v.replace(tzinfo=None)  # type: ignore[union-attr]
                # exact integer micros — float .timestamp() loses precision
                epoch_us = (naive - _dt.datetime(1970, 1, 1)) // _dt.timedelta(
                    microseconds=1
                )
            else:
                epoch_us = int(v)  # type: ignore[arg-type]
            write_long(buf, epoch_us)
            return
        if lt == "date":
            days = v.toordinal() - 719163 if hasattr(v, "toordinal") else int(v)  # type: ignore[union-attr]
            write_long(buf, days)
            return
        _encode_datum(buf, v, at["type"])
        return
    if at == "null":
        return
    if at == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif at in ("int", "long"):
        write_long(buf, int(v))  # type: ignore[arg-type]
    elif at == "float":
        buf.write(struct.pack("<f", float(v)))  # type: ignore[arg-type]
    elif at == "double":
        buf.write(struct.pack("<d", float(v)))  # type: ignore[arg-type]
    elif at == "bytes":
        _write_bytes(buf, bytes(v))  # type: ignore[arg-type]
    elif at == "string":
        _write_str(buf, str(v))
    else:
        raise ValueError(f"unsupported avro type: {at}")


def _decode_datum(data: bytes, pos: int, at: object) -> tuple[object, int]:
    if isinstance(at, list):
        idx, pos = read_long(data, pos)
        branch = at[idx]
        if branch == "null":
            return None, pos
        return _decode_datum(data, pos, branch)
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-micros":
            us, pos = read_long(data, pos)
            import datetime as _dt

            return (
                _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us),
                pos,
            )
        if lt == "date":
            days, pos = read_long(data, pos)
            import datetime as _dt

            return _dt.date(1970, 1, 1) + _dt.timedelta(days=days), pos
        return _decode_datum(data, pos, at["type"])
    if at == "null":
        return None, pos
    if at == "boolean":
        return data[pos] == 1, pos + 1
    if at in ("int", "long"):
        return read_long(data, pos)
    if at == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if at == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if at == "bytes":
        n, pos = read_long(data, pos)
        return data[pos : pos + n], pos + n
    if at == "string":
        n, pos = read_long(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    raise ValueError(f"unsupported avro type: {at}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def encode_container(
    rows: list[tuple], schema: dict, codec: str = "deflate", block_rows: int = 4096
) -> bytes:
    """Serialize rows (tuples in field order) to one Avro container file."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(out, len(meta))
    for k, v in meta.items():
        _write_str(out, k)
        _write_bytes(out, v)
    write_long(out, 0)  # end of metadata map
    out.write(SYNC)
    ftypes = [f["type"] for f in schema["fields"]]
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        body = io.BytesIO()
        for row in chunk:
            for v, at in zip(row, ftypes):
                _encode_datum(body, v, at)
        payload = body.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate, no zlib wrap
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.write(payload)
        out.write(SYNC)
    return out.getvalue()


def decode_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse a container file header -> (schema, codec, sync, pos-after-
    header). Needs only the first few KB of the file; raises IndexError if
    ``data`` is truncated mid-header (callers may retry with more bytes)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(data, pos)
        if n == 0:
            break
        if n < 0:  # negative count blocks carry a byte size first
            n = -n
            _, pos = read_long(data, pos)
        for _ in range(n):
            kl, pos = read_long(data, pos)
            k = data[pos : pos + kl].decode()
            pos += kl
            vl, pos = read_long(data, pos)
            meta[k] = data[pos : pos + vl]
            pos += vl
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if len(data) < pos + 16:
        raise IndexError("truncated header")
    sync = data[pos : pos + 16]
    pos += 16
    return schema, codec, sync, pos


def decode_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse one Avro container file -> (schema, rows as tuples)."""
    schema, codec, sync, pos = decode_header(data)
    ftypes = [f["type"] for f in schema["fields"]]
    rows: list[tuple] = []
    while pos < len(data):
        count, pos = read_long(data, pos)
        size, pos = read_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        p = 0
        for _ in range(count):
            vals = []
            for at in ftypes:
                v, p = _decode_datum(payload, p, at)
                vals.append(v)
            rows.append(tuple(vals))
    return schema, rows


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def _read_schema_from_header(spark: SparkSession, files: DataFrame) -> dict:
    """Fetch one file's SCHEMA without collecting its content: read the
    header bytes (a few hundred bytes) straight from the file when the
    path is local, falling back to a full-content collect for remote
    schemes. Avoids pulling a multi-GB container file to the driver just
    to learn its field list."""
    first = files.select("path").limit(1).collect()
    if not first:
        raise FileNotFoundError("no .avro files found")
    uri = first[0][0]
    local = uri[5:] if uri.startswith("file:") else (uri if uri.startswith("/") else None)
    if local and os.path.exists(local):
        size, buf = 4096, b""
        while True:
            with open(local, "rb") as fh:
                buf = fh.read(size)
            try:
                schema, _, _, _ = decode_header(buf)
                return schema
            except IndexError:
                if len(buf) < size:  # whole file read, still truncated
                    raise ValueError(f"corrupt avro header: {uri}") from None
                size *= 4
    blob = files.select("content").limit(1).collect()[0][0]
    schema, _, _, _ = decode_header(bytes(blob))
    return schema


def read_avro_py(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read without the spark-avro jar: ``binaryFile``
    lists/assigns files to tasks, this codec decodes inside mapInPandas
    (one pass per file, Arrow batches out). The schema comes from one
    file's HEADER read on the driver; all files must share it.

    Timestamps decode to naive-UTC datetimes, and the session timezone is
    pinned to UTC (ensure_session_confs) so Arrow interprets them as the
    written instants on any host/session."""
    from datafusion_ballista_dhruvil_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    schema = _read_schema_from_header(spark, files)
    ddl = spark_ddl_for(schema)
    cols = [f["name"] for f in schema["fields"]]

    def decode_batch(it):
        import pandas as _pd

        for pdf in it:
            for blob in pdf["content"]:
                _, rows = decode_container(bytes(blob))
                yield _pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(decode_batch, schema=ddl)


def write_avro_py(
    df: DataFrame, path: str, codec: str = "deflate", mode: str = "error"
) -> None:
    """Distributed Avro write: each partition serializes itself with this
    codec and writes ``part-NNNNN.avro`` into ``path``. POSIX-path targets
    only (local/NFS — executors and driver share the FS in this
    deployment); object-store writes belong to the spark-avro jar.

    Timestamp/date columns are converted to their Avro logical-type
    integers (epoch micros / epoch days) IN SPARK, where timezone
    semantics are well-defined — Python-side datetime objects from
    ``df.rdd`` carry OS-local wall time, and encoding those as UTC would
    shift every instant by the host's UTC offset on a non-UTC machine.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if mode not in ("error", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}: use 'error' or 'overwrite'")
    if os.path.exists(path):
        if mode == "overwrite":
            for f in os.listdir(path):
                if f.endswith(".avro"):
                    os.unlink(os.path.join(path, f))
        else:
            raise FileExistsError(path)
    os.makedirs(path, exist_ok=True)
    schema = avro_schema_for(df)  # logical types come from the ORIGINAL df
    conv = []
    for fld in df.schema.fields:
        if isinstance(fld.dataType, T.TimestampType):
            conv.append(F.unix_micros(F.col(fld.name)).alias(fld.name))
        elif isinstance(fld.dataType, T.DateType):
            conv.append(
                F.datediff(F.col(fld.name), F.lit("1970-01-01").cast("date")).alias(
                    fld.name
                )
            )
        else:
            conv.append(F.col(fld.name))
    staged = df.select(*conv)

    def write_partition(idx: int, it):
        rows = [tuple(r) for r in it]
        if rows:
            blob = encode_container(rows, schema, codec=codec)
            with open(os.path.join(path, f"part-{idx:05d}.avro"), "wb") as fh:
                fh.write(blob)
        yield idx

    staged.rdd.mapPartitionsWithIndex(write_partition).count()
