"""Regression tests for short/empty-input edge cases found in code review:
Spark's sequence() DESCENDS when stop < start, so n-gram/frame operators
must guard degenerate documents instead of crashing."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.sql.rewrite import rewrite_sql


def _docs(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return df


def test_shingles_survive_short_docs(spark, tmp_path, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.dedup as dedup

    short = _docs(spark, ["a", "a b", "a b c", "a b c d e f"])

    class FakeTables:
        def __init__(self, *_): self.documents = short

    monkeypatch.setattr(dedup, "Tables", FakeTables)
    rows = dedup._shingle_df(spark, "unused").collect()
    # docs 0 and 1 (<3 tokens) contribute nothing; doc 2 has 1 trigram
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.s)
    assert 0 not in by_doc and 1 not in by_doc
    assert by_doc[2] == ["a b c"]
    assert len(by_doc[3]) == 4


def test_bigram_profile_survives_single_token_docs(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.text as text

    docs = _docs(spark, ["solo", "two words here"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(text, "Tables", FakeTables)
    rows = text.text_ngram_profile(spark, "unused").collect()
    assert all(r.bigram for r in rows)  # no crash, no empty bigrams


def test_frame_sample_survives_empty_payload(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.multimodal as mm

    docs = _docs(spark, ["", "x" * 100])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(mm, "Tables", FakeTables)
    rows = {r.doc_id: r for r in mm.mm_frame_sample(spark, "unused").collect()}
    assert rows[0].n_frames == 0 and rows[0].frame_offsets == ""
    assert rows[1].n_frames == 2  # offsets 0 and 64


def test_external_table_ddl_with_typed_columns():
    out = rewrite_sql(
        "CREATE EXTERNAL TABLE t (a DECIMAL(12,2), b INT) "
        "STORED AS CSV LOCATION '/tmp/x'"
    )
    assert out.startswith("CREATE TABLE t (a DECIMAL(12,2), b INT) USING CSV")


def test_numeric_trunc_rewrite():
    assert rewrite_sql("SELECT trunc(1.7)") == "SELECT trunc_number(1.7)"
    # two-arg (date) trunc untouched
    assert "trunc(d, 'MM')" in rewrite_sql("SELECT trunc(d, 'MM')")


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    from datafusion_ballista_dhruvil_spark.operators.scale import salted_join

    df = spark.range(3).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError, match="fact-preserving"):
        salted_join(df, df, "k", "k", how="full_outer")
