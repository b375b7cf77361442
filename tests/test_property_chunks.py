"""Property-based conformance for chunk_hashes — the non-overlapping
CHUNK_WIDTH-char window base behind text_chunk_crossdup /
dedup_chunk_pagerank / dedup_kcore_peel.

Contract pinned: one md5 per window at offsets 0, W, 2W, ...; the final
ragged window hashes the remainder; an EMPTY document still yields
exactly one row (md5 of ""), which the greatest(L-1, 0) clamp exists
for. Oracle: Python md5 over the same slicing, with the width
monkeypatched small so multi-window and boundary-exact documents
(len == kW) occur constantly.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators import text as text_mod

_W = 5

doc = st.text(alphabet="abcxyz ", max_size=23)
corpus = st.lists(doc, min_size=1, max_size=10)


def _oracle(s: str, w: int = _W) -> list[str]:
    starts = range(0, max(len(s) - 1, 0) + 1, w)
    return [hashlib.md5(s[i : i + w].encode()).hexdigest() for i in starts]


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=corpus)
def test_chunk_hashes_match_definition(spark, monkeypatch, texts):
    monkeypatch.setattr(text_mod, "CHUNK_WIDTH", _W)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, list[str]] = {}
    for r in text_mod.chunk_hashes(docs).collect():
        got.setdefault(r.doc_id, []).append(r.h)
    want = {i: _oracle(t) for i, t in enumerate(texts)}
    # chunk order within a doc is not part of the contract (consumers
    # group by hash); compare as multisets per doc
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }
