"""Property-based conformance for the digest-representative LSH kernel
(r8; the kernel's canonical key changed this round — ADVICE r7 #3).

The OPTIMIZATION under test: ``verified_pairs_of`` scores ONE
representative pair per (canonical-digest, canonical-digest) class and
joins the verdict back to every candidate pair. The PROPERTY: its output
is bit-identical to scoring every candidate pair directly — for any
corpus, including the template-heavy shapes (many exact-set duplicate
classes) the rep path exists for, and mutated near-dups that share a
digest class with nobody.

The direct oracle recomputes per-pair Jaccard in plain Python over the
collected shingle sets (same ints -> same IEEE division as Spark's
double divide, so float equality is exact).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.dedup import (
    lsh_candidates,
    shingle_arrays_of,
    verified_pairs_of,
)

VOCAB = [f"w{i}" for i in range(12)]

template = st.lists(st.sampled_from(VOCAB), min_size=6, max_size=10)
#: (template_idx, [(pos_frac, vocab_idx)]) — a doc is a template with
#: 0-2 token substitutions; several docs share a template untouched, so
#: exact-set digest classes with >1 member arise constantly
doc = st.tuples(
    st.integers(0, 3),
    st.lists(
        st.tuples(st.floats(0, 1, allow_nan=False), st.integers(0, 11)),
        min_size=0,
        max_size=2,
    ),
)
corpus_ast = st.tuples(
    st.lists(template, min_size=4, max_size=4),
    st.lists(doc, min_size=5, max_size=18),
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


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(corpus_ast)
def test_digest_rep_verification_equals_direct_pairwise(spark, ast):
    rows = _materialize(ast)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrs = shingle_arrays_of(docs)
    got = {
        (r.d1, r.d2): r.jaccard for r in verified_pairs_of(arrs).collect()
    }

    ss = {r.doc_id: set(r.ss) for r in arrs.collect()}
    want = {}
    for r in lsh_candidates(arrs).collect():
        a, b = ss[r.d1], ss[r.d2]
        c = len(a & b)
        u = len(a) + len(b) - c
        if u and c / u >= 0.5:
            want[(r.d1, r.d2)] = c / u
    assert got == want
