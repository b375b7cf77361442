"""Python DataSource (sources/pysource.py): the custom-TableProvider
surface — snapshot resolution, time travel, per-file partition planning,
Arrow-batch ingest — against real manifest-log tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.sources.pysource import register
from datafusion_ballista_dhruvil_spark.sources.snapshots import (
    commit,
    history,
    read_snapshot,
)
from datafusion_ballista_dhruvil_spark.session import Tables

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pysource") / "tbl")
    docs = Tables(spark, SF_DIR).documents.select("doc_id", "lang", "n_chars")
    commit(docs.where(F.col("doc_id") < 100), root, "append")
    commit(docs.where(F.col("doc_id").between(100, 199)), root, "append")
    register(spark)
    return root


def _load(spark, root, **opts):
    r = spark.read.format("snapshot_log")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(root)


def test_latest_matches_builtin_reader(spark, table):
    via_ds = _load(spark, table)
    via_builtin = read_snapshot(spark, table)
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_builtin.collect())
    )
    assert via_ds.schema == via_builtin.schema


def test_explicit_version(spark, table):
    v0 = _load(spark, table, version=0)
    assert v0.count() == 100
    assert v0.agg(F.max("doc_id")).first()[0] == 99


def test_time_travel_as_of(spark, table):
    ts0 = history(table)[0]["ts_ms"]
    asof = _load(spark, table, as_of_ts_ms=str(ts0))
    assert asof.count() == 100  # resolves to snapshot 0


def test_one_partition_per_data_file(spark, table):
    import json
    import os

    with open(os.path.join(table, "_log", "00000001.json")) as f:
        n_files = len(json.load(f)["files"])
    df = _load(spark, table)
    assert df.rdd.getNumPartitions() == n_files


def test_missing_version_raises(spark, table):
    with pytest.raises(Exception, match="snapshot 99 not found"):
        _load(spark, table, version=99).collect()


def test_aggregates_compose(spark, table):
    # the provider's output is a normal DataFrame: joins/aggs plan over it
    out = (
        _load(spark, table)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )
    expect = (
        read_snapshot(spark, table)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in expect.collect()
    ]


def test_writer_roundtrip_append_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "wtbl")
    docs = Tables(spark, SF_DIR).documents.select("doc_id", "lang", "n_chars")
    register(spark)
    docs.where(F.col("doc_id") < 50).write.format("snapshot_log").mode(
        "append"
    ).save(root)
    docs.where(F.col("doc_id").between(50, 99)).write.format(
        "snapshot_log"
    ).mode("append").save(root)
    latest = _load(spark, root)
    assert latest.count() == 100
    # version 0 still readable after the second append (snapshot isolation)
    assert _load(spark, root, version=0).count() == 50
    # overwrite replaces the live set; history is preserved
    docs.where(F.col("doc_id") < 10).write.format("snapshot_log").mode(
        "overwrite"
    ).save(root)
    assert _load(spark, root).count() == 10
    assert _load(spark, root, version=1).count() == 100
    assert [h["op"] for h in history(root)] == [
        "append",
        "append",
        "overwrite",
    ]


def test_writer_values_roundtrip_exactly(spark, tmp_path):
    root = str(tmp_path / "vtbl")
    register(spark)
    docs = Tables(spark, SF_DIR).documents.select("doc_id", "lang", "n_chars")
    docs.write.format("snapshot_log").mode("append").save(root)
    got = sorted(map(tuple, _load(spark, root).collect()))
    want = sorted(map(tuple, docs.collect()))
    assert got == want


def test_empty_table_dir_raises_cleanly(spark, tmp_path):
    register(spark)
    with pytest.raises(Exception, match="no snapshots"):
        _load(spark, str(tmp_path / "nothing_here")).collect()


def test_old_version_schema_preserved_after_evolution(spark, tmp_path):
    """Each snapshot records ITS schema: reading an old version after a
    differently-shaped overwrite must return the old shape."""
    root = str(tmp_path / "evolve")
    docs = Tables(spark, SF_DIR).documents
    register(spark)
    docs.select("doc_id", "lang").write.format("snapshot_log").mode(
        "append"
    ).save(root)
    docs.select("doc_id", "lang", "n_chars").write.format(
        "snapshot_log"
    ).mode("overwrite").save(root)
    v0 = _load(spark, root, version=0)
    v1 = _load(spark, root)
    assert [f.name for f in v0.schema] == ["doc_id", "lang"]
    assert [f.name for f in v1.schema] == ["doc_id", "lang", "n_chars"]
    assert v0.count() == v1.count()
