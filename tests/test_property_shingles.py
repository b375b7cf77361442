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
