"""Property-based conformance for the SimHash kernel (VERDICT r8 #8 — the
last-but-one engine-sensitive numeric kernel without a first-principles
fuzz).

Two claims are under test, both against plain-Python oracles:

1. **Signature math**: dedup_simhash_pairs derives 60 bits per document
   from TWO 15-nibble integer masks of one md5 per distinct token (bit
   j<30 = top bit of nibble j+1, bit j>=30 = second bit of nibble j-29;
   document bit = sign of the +/-1 sum). The oracle recomputes every
   signature from hashlib.md5 hex nibbles directly.
2. **Banding losslessness (the pigeonhole guarantee)**: candidate
   generation buckets by the two 30-bit signature halves; a pair within
   Hamming distance 1 differs in at most one bit, so it agrees on at
   least one WHOLE half and is found by one of the two bands. The
   oracle is brute-force all-pairs Hamming over the Python signatures —
   the Spark result must equal it EXACTLY (no pair missed by banding,
   none duplicated by the first-agreeing-band emission rule, hamming
   values identical).

Corpora are template-heavy (shared templates + 0-2 token mutations), the
shape that actually produces Hamming-0/1 pairs and multi-doc buckets.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES

load_all()

VOCAB = [f"w{i}" for i in range(14)]

template = st.lists(st.sampled_from(VOCAB), min_size=5, max_size=9)
doc = st.tuples(
    st.integers(0, 3),
    st.lists(
        st.tuples(st.floats(0, 1, allow_nan=False), st.integers(0, 13)),
        min_size=0,
        max_size=2,
    ),
)
corpus_ast = st.tuples(
    st.lists(template, min_size=4, max_size=4),
    st.lists(doc, min_size=4, max_size=16),
)


def _materialize(ast) -> list[tuple[int, str]]:
    templates, docs = ast
    rows = []
    for i, (t_idx, muts) in enumerate(docs):
        toks = list(templates[t_idx])
        for frac, v_idx in muts:
            toks[int(frac * (len(toks) - 1))] = VOCAB[v_idx]
        rows.append((i, " ".join(toks)))
    return rows


def _py_signature(text: str) -> int:
    """First-principles 60-bit SimHash: one md5 per DISTINCT token, bit
    j<30 from the top bit (mask 8) of hex nibble j+1, bit j>=30 from the
    second bit (mask 4) of nibble j-29; sig bit set iff the +/-1 vote sum
    over tokens is > 0."""
    votes = [0] * 60
    for tok in set(text.split(" ")):
        h = hashlib.md5(tok.encode()).hexdigest()
        for j in range(60):
            i = (j + 1) if j < 30 else (j - 29)
            mask = 8 if j < 30 else 4
            votes[j] += 1 if int(h[i - 1], 16) & mask else -1
    return sum(1 << j for j in range(60) if votes[j] > 0)


def _py_pairs(rows: list[tuple[int, str]]) -> list[tuple[int, int, int]]:
    sigs = {doc_id: _py_signature(text) for doc_id, text in rows}
    out = []
    ids = sorted(sigs)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            ham = bin(sigs[ids[a]] ^ sigs[ids[b]]).count("1")
            if ham <= 1:
                out.append((ids[a], ids[b], ham))
    return sorted(out)


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(corpus_ast)
def test_simhash_pairs_match_brute_force(spark, tmp_path_factory, ast):
    rows = _materialize(ast)
    sf_dir = tmp_path_factory.mktemp("simhash_fuzz")
    spark.createDataFrame(
        [(i, t, "en", "fuzz", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    got = [
        (r.d1, r.d2, r.hamming)
        for r in QUERIES["dedup_simhash_pairs"](spark, str(sf_dir)).collect()
    ]
    assert sorted(got) == _py_pairs(rows)
    # emission-rule uniqueness: no candidate pair reported twice
    assert len(got) == len(set((a, b) for a, b, _ in got))
