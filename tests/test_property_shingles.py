"""Property-based conformance for shingle_arrays_of — the word-trigram
shingle-set base every dedup kernel builds on (its docstring carries two
subtle guarantees worth pinning: DISTINCT shingles as a SET, and short
documents (< n tokens) yielding an EMPTY array rather than out-of-bounds
slices — Spark's sequence() descends when stop < 1, so the obvious
formulation breaks exactly there).

Oracle: the three-line Python definition over the same whitespace split.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.dedup import (
    shingle_arrays_of,
)

_VOCAB = ["a", "bb", "ccc", "dd", "e"]

doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(
    " ".join
)
corpus = st.lists(doc, min_size=1, max_size=10)


def _oracle(text: str, n: int = 3) -> set[str]:
    # Python's "".split(" ") yields [""] like Spark's split — one token,
    # so any doc under n tokens produces the empty set below
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(corpus)
def test_shingle_sets_match_definition(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: set(r.ss) for r in shingle_arrays_of(docs).collect()}
    assert got == {i: _oracle(t) for i, t in enumerate(texts)}


def test_shingle_spread_partitions_rule():
    """r11 (VERDICT r10 #3): the shingle-kernel spread must be a no-op in
    BOTH measured-loss regimes — tiny local inputs (the r10 cold-JIT A/B)
    and already-parallel scans (100 TB posture: never re-shuffle the raw
    text payload) — and size to ~4 MB/task in between."""
    from datafusion_ballista_dhruvil_spark.operators.dedup import (
        _SPREAD_MIN_BYTES,
        _SPREAD_TARGET_BYTES,
        shingle_spread_partitions,
    )

    mb = 2**20
    # sf0.1 regime: 0.6 MB, 32 cores -> no-op (plans unchanged locally)
    assert shingle_spread_partitions(594_568, 32) == 0
    # below the floor stays a no-op with headroom
    assert shingle_spread_partitions(_SPREAD_MIN_BYTES - 1, 32) == 0
    # mid regime: 64 MB is one natural split but ~90 s of kernel CPU ->
    # spread to 16 x ~4 MB tasks
    assert shingle_spread_partitions(64 * mb, 32) == 16
    # capped at the core budget
    assert shingle_spread_partitions(512 * mb, 32) == 32
    # scan already saturates the cores (100 TB): never add a payload shuffle
    assert shingle_spread_partitions(32 * 128 * mb, 32) == 0
    assert shingle_spread_partitions(10 * 2**40, 1000) == 0
    # degenerate core budget
    assert shingle_spread_partitions(64 * mb, 1) == 0
    assert _SPREAD_TARGET_BYTES < _SPREAD_MIN_BYTES
