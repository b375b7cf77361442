"""Property-based roundtrip for the jar-less pure-Python Avro codec
(sources/avro_py.py) — a hand-written binary codec is exactly where a
fuzz earns its keep: zig-zag varints at sign/width boundaries, empty
strings/bytes, null-union branch indices, timestamp/date logical types,
block boundaries (block_rows down to 1), both codecs.

Property: decode_container(encode_container(rows, schema)) == (schema,
rows) for random schemas over every supported type and random rows —
including int64 extremes, NaN-free doubles (NaN != NaN would break a
== check; the static suite covers NaN separately), and non-ASCII text.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.sources.avro_py import (
    decode_container,
    encode_container,
)

_I64 = 2**63
_GENS = {
    "long": st.integers(-_I64, _I64 - 1),
    "double": st.floats(allow_nan=False, width=64),
    "string": st.text(max_size=12),
    "boolean": st.booleans(),
    "bytes": st.binary(max_size=12),
    ("long",): st.one_of(st.none(), st.integers(-_I64, _I64 - 1)),
    ("string",): st.one_of(st.none(), st.text(max_size=8)),
    "ts": st.integers(-(2**40), 2**40).map(
        lambda us: datetime.datetime(1970, 1, 1)
        + datetime.timedelta(microseconds=us)
    ),
    "date": st.integers(-100_000, 100_000).map(
        lambda d: datetime.date(1970, 1, 1) + datetime.timedelta(days=d)
    ),
}


def _avro_type(key):
    if key == "ts":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if key == "date":
        return {"type": "int", "logicalType": "date"}
    if isinstance(key, tuple):
        return ["null", key[0]]
    return key


fields = st.lists(
    st.sampled_from(sorted(_GENS, key=str)), min_size=1, max_size=5
)


@st.composite
def container(draw):
    fkeys = draw(fields)
    n = draw(st.integers(0, 8))
    rows = [tuple(draw(_GENS[k]) for k in fkeys) for _ in range(n)]
    schema = {
        "type": "record",
        "name": "fuzz",
        "fields": [
            {"name": f"f{i}", "type": _avro_type(k)}
            for i, k in enumerate(fkeys)
        ],
    }
    codec = draw(st.sampled_from(["null", "deflate"]))
    block_rows = draw(st.integers(1, 4))
    return schema, rows, codec, block_rows


@settings(
    max_examples=200, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(container())
def test_container_roundtrip_fuzz(case):
    schema, rows, codec, block_rows = case
    blob = encode_container(rows, schema, codec=codec, block_rows=block_rows)
    got_schema, got_rows = decode_container(blob)
    assert got_schema == schema
    assert got_rows == rows
