"""Zipf-skew regression gate (VERDICT r7 #6): the r7 one-off skew axis
(tools/skew_stress.py, PERF.md r7) promoted to a pinned sf0.01 smoke so
the degenerate-template / power-law-user corpus stays BOTH bounded and
hash-correct under regression, not just in a tools/ run.

Two properties, split exactly as the axis proved them:

1. **Below-cap hash correctness** — on a skewed corpus whose hot cluster
   stays under MAX_BUCKET_DOCS, every representative query must still
   hash-match its DuckDB oracle (the skew transforms are deterministic
   column arithmetic, so the oracle runs on the same skewed parquet).
2. **Loud truncation above the cap** — when the cap binds (forced low
   here so the sf0.01 corpus becomes 'degenerate'), the
   observe_bucket_cap WARNING must fire; silent recall loss is the
   failure mode the observer exists to prevent.

The corpus is built once per test session from sf0.01 with COPIES=2
(seconds, not minutes); the 12-query list is skew_stress.SKEW_QUERIES —
the set PERF.md r7 adjudicated 0-bad.
"""

from __future__ import annotations

import logging
import time

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES

load_all()

_COPIES = 2
_SRC = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    from tools import scale_stress, skew_stress

    out = str(tmp_path_factory.mktemp("skew_gate"))
    prev = scale_stress.COPIES
    scale_stress.COPIES = _COPIES  # module global read by build()
    try:
        skew_stress.build_skew(spark, out, src=_SRC, copies=_COPIES)
    finally:
        scale_stress.COPIES = prev
    return out


def test_skewed_corpus_stays_hash_correct(spark, skew_dir):
    """Property 1: the 12 representative queries (banded candidate
    generation, hot-key groupBys, user-keyed event shuffles) hash-match
    DuckDB on the BELOW-CAP skewed corpus — skew must change timing,
    never results."""
    from tools.drive_common import compare_all, make_duckdb
    from tools.skew_stress import SKEW_QUERIES

    con = make_duckdb(skew_dir)
    fails = compare_all(spark, con, QUERIES, ORACLES, SKEW_QUERIES, skew_dir)
    assert fails == 0


def test_bucket_cap_observer_fires_when_cap_binds(spark, skew_dir, monkeypatch):
    """Property 2: force MAX_BUCKET_DOCS below the hot template cluster
    (~75 docs share one text at sf0.01 x2) and the truncation WARNING
    must fire on the banded-LSH path — the cap may change results ONLY
    loudly."""
    from datafusion_ballista_dhruvil_spark.operators import dedup

    monkeypatch.setattr(dedup, "MAX_BUCKET_DOCS", 8)

    class _Rec(logging.Handler):
        def __init__(self) -> None:
            super().__init__(level=logging.WARNING)
            self.lines: list[str] = []

        def emit(self, record: logging.LogRecord) -> None:
            msg = record.getMessage()
            if "MAX_BUCKET_DOCS" in msg:
                self.lines.append(msg)

    rec = _Rec()
    logger = logging.getLogger(
        "datafusion_ballista_dhruvil_spark.operators.dedup"
    )
    logger.addHandler(rec)
    try:
        QUERIES["dedup_minhash_lsh"](spark, skew_dir).collect()
        # the observation logs from a daemon thread after the action
        for _ in range(20):
            if rec.lines:
                break
            time.sleep(0.25)
    finally:
        logger.removeHandler(rec)
    assert rec.lines, "cap bound silently: no MAX_BUCKET_DOCS warning"


def test_capped_bucket_emits_exactly_the_smallest_ids(spark, monkeypatch):
    """The cap's OUTPUT contract, mechanically: a degenerate bucket (30
    identical docs) with MAX_BUCKET_DOCS=8 must emit exactly C(8,2)=28
    candidate pairs, all among the 8 SMALLEST doc_ids (the deterministic
    truncation rule the capacity-planning docs promise)."""
    from itertools import combinations

    from datafusion_ballista_dhruvil_spark.operators import dedup

    monkeypatch.setattr(dedup, "MAX_BUCKET_DOCS", 8)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta") for i in range(30)],
        "doc_id long, text string",
    )
    arrs = dedup.shingle_arrays_of(docs)
    pairs = {(r.d1, r.d2) for r in dedup.lsh_candidates(arrs).collect()}
    assert pairs == set(combinations(range(8), 2))
