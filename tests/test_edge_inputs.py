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


def test_repetition_filter_survives_degenerate_docs(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.text as text

    clean = " ".join(f"w{i}" for i in range(20))  # 19 unique bigrams
    docs = _docs(spark, ["", "a", "a b", clean, "x x x x"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(text, "Tables", FakeTables)
    rows = {r.doc_id: r for r in text.text_repetition_filter(spark, "unused").collect()}
    # docs with < 2 bigrams are excluded, not crashed on
    assert set(rows) == {3, 4}
    assert rows[3].keep  # all-unique bigrams: top frac 1/19 < 1/16
    assert not rows[4].keep  # "x x x x": top bigram frac 1.0 -> drop


def test_decontam_empty_eval_set(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.text as text

    # all docs too short for a 5-gram: eval set empty, no crash, no rows
    docs = _docs(spark, ["a b", "c d", "e f g h"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(text, "Tables", FakeTables)
    assert text.text_decontam_overlap(spark, "unused").count() == 0


def test_simhash_pairs_unique_emission_for_exact_dups(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.dedup as dedup

    # 3 identical docs agree on BOTH signature halves: the first-agreeing-
    # band rule must emit each pair exactly once (regression for the
    # removed distinct())
    same = "alpha beta gamma delta epsilon zeta"
    docs = _docs(spark, [same, same, same, "totally different words here now"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(dedup, "Tables", FakeTables)
    rows = dedup.dedup_simhash_pairs(spark, "unused").collect()
    pairs = [(r.d1, r.d2) for r in rows]
    assert sorted(pairs) == [(0, 1), (0, 2), (1, 2)]
    assert all(r.hamming == 0 for r in rows)


def test_kmeans_assign_fewer_vectors_than_k(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0 - i], i % 2) for i in range(3)],
        "vec_id long, embedding array<float>, label int",
    )

    class FakeTables:
        def __init__(self, *_): self.embeddings = emb

    monkeypatch.setattr(sim, "Tables", FakeTables)
    rows = {r.vec_id: r for r in sim.sim_kmeans_assign(spark, "unused").collect()}
    # every vector is its own centroid: self-assignment at distance 0
    assert set(rows) == {0, 1, 2}
    assert all(r.cluster == vid and r.dist2_q == 0 for vid, r in rows.items())


def test_lsh_mega_bucket_capped(spark, monkeypatch):
    """All-identical docs put every doc in ONE (band, sig) bucket; the
    MAX_BUCKET_DOCS guard must bound the pair explosion to cap^2 instead of
    n^2 (VERDICT r1 scale-killer #1)."""
    import datafusion_ballista_dhruvil_spark.operators.dedup as dedup

    n, cap = 60, 8
    docs = _docs(spark, ["the same boilerplate text body here ok"] * n)

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(dedup, "Tables", FakeTables)
    monkeypatch.setattr(dedup, "MAX_BUCKET_DOCS", cap)
    pairs = dedup._verified_pairs(spark, "unused").collect()
    # kept members are the cap smallest doc_ids; all pairs among them emit
    assert len(pairs) == cap * (cap - 1) // 2
    ids = {r.d1 for r in pairs} | {r.d2 for r in pairs}
    assert ids == set(range(cap))
    assert all(r.jaccard == 1.0 for r in pairs)


def test_simhash_mega_bucket_capped(spark, monkeypatch):
    import datafusion_ballista_dhruvil_spark.operators.dedup as dedup

    n, cap = 60, 8
    docs = _docs(spark, ["the same boilerplate text body here ok"] * n)

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(dedup, "Tables", FakeTables)
    monkeypatch.setattr(dedup, "MAX_BUCKET_DOCS", cap)
    rows = dedup.dedup_simhash_pairs(spark, "unused").collect()
    # identical sigs -> hamming 0 pairs, only among the cap kept members
    assert len(rows) == cap * (cap - 1) // 2
    ids = {r.d1 for r in rows} | {r.d2 for r in rows}
    assert ids == set(range(cap))


def test_lsh_normal_path_unchanged_by_cap(spark, monkeypatch):
    """With the default (large) cap, results are identical to an uncapped
    run on a normal corpus — the guard only bites on degenerate buckets."""
    import datafusion_ballista_dhruvil_spark.operators.dedup as dedup

    texts = [f"alpha beta gamma delta {i} epsilon zeta" for i in range(20)]
    texts += [texts[0], texts[5]]  # two exact dups -> J=1.0 pairs
    docs = _docs(spark, texts)

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(dedup, "Tables", FakeTables)
    capped = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in dedup._verified_pairs(spark, "unused").collect()
    )
    monkeypatch.setattr(dedup, "MAX_BUCKET_DOCS", 10**9)
    uncapped = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in dedup._verified_pairs(spark, "unused").collect()
    )
    assert capped == uncapped and len(capped) >= 2


def test_image_pipeline_survives_empty_and_tiny_payloads(spark, monkeypatch):
    """Empty doc -> 1x1 gray BMP (mean 127, all-zero ahash bits); 1-byte
    doc -> 2x2 image; decode path must not div-by-zero or misparse."""
    import datafusion_ballista_dhruvil_spark.operators.multimodal as mm

    docs = _docs(spark, ["", "x", "hello world"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(mm, "Tables", FakeTables)
    feats = {r.doc_id: r for r in mm.mm_decode_features(spark, "unused").collect()}
    assert feats[0].width == 1 and feats[0].height == 1
    assert feats[0].mean_pixel == 127.0 and feats[0].decode_ok
    assert feats[1].width == 2 and feats[1].height == 2
    hashes = {r.doc_id: r for r in mm.mm_image_ahash(spark, "unused").collect()}
    assert hashes[0].ahash == "0" * 64  # no pixel exceeds the uniform mean
    assert len(hashes[2].ahash) == 64


def test_audio_pipeline_survives_empty_payload(spark, monkeypatch):
    """Empty doc synthesizes one zero sample: duration 0 ms, silence."""
    import datafusion_ballista_dhruvil_spark.operators.multimodal as mm

    docs = _docs(spark, ["", "abc"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(mm, "Tables", FakeTables)
    rows = {r.doc_id: r for r in mm.mm_audio_features(spark, "unused").collect()}
    assert rows[0].n_samples == 1 and rows[0].mean_abs == 0.0 and rows[0].peak == 0
    assert rows[1].n_samples == 3 and rows[1].sample_rate == 16000


def test_weighted_quantile_tiny_groups(spark):
    """k = ceil(q*n) must stay >= 1 for 1-row groups and hit the exact
    order statistic for small n (no off-by-one at the bucket boundary)."""
    from datafusion_ballista_dhruvil_spark.operators.relational import (
        weighted_quantile,
    )

    df = spark.createDataFrame(
        [("a", 7, 1)]
        + [("b", v, 1) for v in (10, 20, 30, 40)],
        "g string, p long, w long",
    )
    got = {
        r.g: (r.lo, r.hi)
        for r in weighted_quantile(
            df, value="p", weight="w", group_cols=["g"],
            qs={"lo": (1, 20), "hi": (19, 20)},
        ).collect()
    }
    # n=1: both quantiles are the single value
    assert got["a"] == (7, 7)
    # n=4: ceil(0.05*4)=1 -> 10; ceil(0.95*4)=4 -> 40
    assert got["b"] == (10, 40)


def test_bloom_decontam_degenerate_eval(spark, monkeypatch):
    """All-eval corpus (every doc is src0): training side is empty ->
    empty result, no crash; and a doc too short for any 5-gram
    contributes nothing."""
    import datafusion_ballista_dhruvil_spark.operators.text as text

    docs = _docs(spark, ["a b c d e f g", "short doc"])

    class FakeTables:
        def __init__(self, *_): self.documents = docs

    monkeypatch.setattr(text, "Tables", FakeTables)
    assert text.text_bloom_decontam(spark, "unused").collect() == []


def test_cdc_merge_view_all_deletes(spark, tmp_path):
    """A delta set whose winning op is 'D' for every touched key must
    leave only untouched base rows."""
    from datafusion_ballista_dhruvil_spark.streaming.sinks import cdc_merge_view

    delta = str(tmp_path / "d")
    spark.createDataFrame(
        [(1, 100, 1000, "U"), (1, 200, 2000, "D"), (2, 150, 1500, "D")],
        "user_id long, ts long, event_id long, op string",
    ).write.parquet(f"{delta}/epoch=0")
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "user_id long, base_value long"
    )
    rows = sorted(
        map(tuple, cdc_merge_view(spark, base, delta).collect())
    )
    assert rows == [(3, 30, "base")]


def test_distinct_on_rewrite_shapes():
    from datafusion_ballista_dhruvil_spark.sql.rewrite import rewrite_sql

    out = rewrite_sql(
        "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, ts DESC"
    )
    assert "ROW_NUMBER() OVER (PARTITION BY k ORDER BY k, ts DESC)" in out
    assert "__don_rn = 1" in out
    # no ORDER BY -> deterministic fallback ordering on the key
    out2 = rewrite_sql("SELECT DISTINCT ON (k) k, v FROM t")
    assert "ORDER BY k)" in out2
    # literals and subqueries are never touched
    assert rewrite_sql("SELECT 'DISTINCT ON (x)' FROM t") == "SELECT 'DISTINCT ON (x)' FROM t"
    sub = "SELECT a FROM (SELECT DISTINCT ON (b) a FROM t) z"
    assert rewrite_sql(sub) == sub


def test_asof_nearest_boundary_click_counts_once(spark, monkeypatch):
    # A click at EXACTLY the purchase instant matches the backward pass
    # only (<=); the forward pass is strict (>) — a wrongly-shifted
    # negated-axis forward pass would double-match it (gap 0 both ways is
    # fine, but a click at t-1us must NEVER appear as "next").
    import datetime as dt

    import datafusion_ballista_dhruvil_spark.operators.temporal as temporal

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    us = lambda n: base + dt.timedelta(microseconds=n)
    events = spark.createDataFrame(
        [
            # user 1: click exactly at purchase time -> gap 0 via backward
            (1, us(1000), 1, "purchase", 1.0, "{}"),
            (2, us(1000), 1, "click", 1.0, "{}"),
            # user 2: click 1us BEFORE purchase -> backward gap 1; the
            # forward pass must NOT see it (strict >): next is +5000
            (3, us(2000), 2, "purchase", 1.0, "{}"),
            (4, us(1999), 2, "click", 1.0, "{}"),
            (5, us(7000), 2, "click", 1.0, "{}"),
            # user 3: only a later click -> aligned forward, gap 3000
            (6, us(3000), 3, "purchase", 1.0, "{}"),
            (7, us(6000), 3, "click", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    class FakeTables:
        def __init__(self, *_): self.events = events

    monkeypatch.setattr(temporal, "Tables", FakeTables)
    row = temporal.asof_nearest_alignment(spark, "unused").collect()[0]
    assert row.n_purchases == 3
    assert row.n_aligned == 3
    assert row.n_within_30m == 3
    # gaps: user1 0 (simultaneous, backward), user2 1 (prev at -1us
    # beats next at +5000), user3 3000 (forward only)
    assert row.sum_gap_us_within == 0 + 1 + 3000


def test_tpcds_margin_guard_yields_null_on_degenerate_revenue(spark, monkeypatch):
    """ANSI Spark errors on integer div-by-zero; the TPC-DS divide-first
    ratios guard the divisor with nullif so a degenerate corpus (group
    revenue under $1) yields NULL margins — matching DuckDB — instead of
    killing the job."""
    import datafusion_ballista_dhruvil_spark.operators.tpcds as tpcds

    li = spark.createDataFrame(
        [(1, 1, 0.01, 0.0)],
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_discount double",
    )
    part = spark.createDataFrame(
        [(1, "PROMO", "Brand#1")], "p_partkey long, p_type string, p_brand string"
    )

    class FakeTables:
        def __init__(self, *_):
            self.lineitem = li
            self.part = part

    monkeypatch.setattr(tpcds, "Tables", FakeTables)
    rows = tpcds.tpcds_q36(spark, "unused").collect()
    assert rows and all(r.margin_ppm is None for r in rows)
