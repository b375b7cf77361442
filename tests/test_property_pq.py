"""Property-based conformance for the PQ/ADC codebook-assignment kernel
(VERDICT r8 #8 — the last engine-sensitive numeric kernel without a
first-principles fuzz; completes the coverage of every kernel the driver
hash gate depends on).

sim_pq_adc encodes each 64-dim vector as 8 sub-codes (argmin over exact
int64 subspace distances against the 16 seed centroids, first-minimum
tie-break) and scans with an ADC lookup table for query vec_id=0. The
oracle here re-derives EVERYTHING from scratch in plain Python — scale-7
half-away-from-zero quantization (frac-vs-0.5 comparison, no numpy
round — np.round is half-to-even), integer squared distances, smallest-
centroid-id tie-break, LUT sums, the (pq_dist, neighbor_id) top-20 — and
the Spark result must match cell-for-cell including the float division
at the end (same int64 / 1e14 => same IEEE double).

Corpora deliberately include EXACT seed duplicates (vectors copied from
codebook rows) so distance-0 and multi-way argmin ties occur, plus
half-ulp-ish values near the .5 rounding boundary via the quantized
value grid.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES

load_all()

#: vectors live on a coarse grid (few distinct values) so identical
#: subvectors — and therefore argmin TIES — are common, which is the
#: failure surface of an assignment kernel (wrong tie-break direction).
#: Magnitudes capped at 0.5 so the total ADC int stays < 2^53
#: (64 * (1e7)^2 = 6.4e15): the final /1e14 double conversion is then
#: injective and order-preserving, and the oracle may sort on exact ints.
GRID = [-0.5, -0.25, -0.1, 0.0, 0.1, 0.25, 0.3333333, 0.5]

vec = st.lists(st.sampled_from(GRID), min_size=64, max_size=64)
#: (16 seed vectors, extra corpus vectors, list of seed-copy indices)
corpus_ast = st.tuples(
    st.lists(vec, min_size=16, max_size=16),
    st.lists(vec, min_size=1, max_size=8),
    st.lists(st.integers(0, 15), min_size=0, max_size=3),
)


def _half_away(x: float) -> int:
    # frac >= 0.5 comparison, NOT floor(ax + 0.5): the +0.5 addition
    # itself rounds across the boundary when ax sits within half an ulp
    # below k+0.5 (same rule as similarity._round_half_away, re-derived)
    ax = abs(x) * 1e7
    fl = math.floor(ax)
    mag = fl + (1 if ax - fl >= 0.5 else 0)
    return int(math.copysign(mag, x))


def _py_expected(rows: list[tuple[int, list[float]]]):
    """First-principles PQ encode + ADC top-20 for query vec_id=0."""
    q = {
        vid: [[_half_away(v) for v in emb[m * 8 : m * 8 + 8]] for m in range(8)]
        for vid, emb in rows
    }
    seeds = {vid: q[vid] for vid, _ in rows if vid < 16}

    def sqdist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def codes_of(vid):
        out = []
        for m in range(8):
            dists = [(sqdist(q[vid][m], seeds[k][m]), k) for k in sorted(seeds)]
            out.append(min(dists)[1])  # ties -> smallest centroid id
        return out

    lut = [
        {k: sqdist(q[0][m], seeds[k][m]) for k in seeds} for m in range(8)
    ]
    scored = []
    for vid, _ in rows:
        if vid == 0:
            continue
        cs = codes_of(vid)
        adc = sum(lut[m][cs[m]] for m in range(8))
        scored.append((adc, vid, "-".join(map(str, cs))))
    scored.sort()
    return [(vid, cs, adc / 1e14) for adc, vid, cs in scored[:20]]


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(corpus_ast)
def test_pq_adc_matches_first_principles(spark, tmp_path_factory, ast):
    seeds, extras, seed_copies = ast
    vecs = list(seeds) + list(extras) + [seeds[i] for i in seed_copies]
    # float32 storage (the embeddings table's element type) THEN the
    # float64 widening both engines perform — the oracle must see the
    # same post-storage values Spark reads back from parquet
    rows = [
        (vid, [float(v) for v in np.asarray(emb, dtype=np.float32)])
        for vid, emb in enumerate(vecs)
    ]
    sf_dir = tmp_path_factory.mktemp("pq_fuzz")
    spark.createDataFrame(
        [(vid, emb, 0) for vid, emb in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(sf_dir / "embeddings.parquet"))
    got = [
        (r.neighbor_id, r.codes, r.pq_dist)
        for r in QUERIES["sim_pq_adc"](spark, str(sf_dir)).collect()
    ]
    assert got == _py_expected(rows)
