"""Property-based conformance for _round_half_away — the numpy kernel
whose job is to bit-match Spark's round() (HALF_UP for positives, half
away from zero) and DuckDB's round() inside the Arrow-vectorized
embedding kernels. Rounding is THE canonical cross-engine divergence
source (np.round is half-to-even; the trunc(x + 0.5) idiom over-rounds
near representability boundaries), so the oracle here is Spark itself:
the fuzz feeds adversarial doubles (exact .5 ties, values within an ulp
of k+0.5 where the naive idiom breaks, negatives, zero) through BOTH
the numpy kernel and spark.sql round() and requires identical int64s.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.similarity import (
    _round_half_away,
)

exact_tie = st.integers(-50, 50).map(lambda k: k + 0.5)
near_tie = st.tuples(st.integers(-50, 50), st.integers(1, 3)).map(
    lambda kn: math.nextafter(kn[0] + 0.5, -math.inf if kn[1] % 2 else math.inf)
)
plain = st.floats(-1e6, 1e6, allow_nan=False)
vals = st.lists(
    st.one_of(exact_tie, near_tie, plain, st.just(0.0), st.just(-0.0)),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(vals)
def test_round_half_away_bit_matches_spark_round(spark, xs):
    got = _round_half_away(np.array(xs, dtype=np.float64)).tolist()
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(xs)], "i long, x double")
    df.createOrReplaceTempView("rh_fuzz")
    want = [
        r.r
        for r in spark.sql(
            "SELECT CAST(round(x) AS BIGINT) AS r FROM rh_fuzz ORDER BY i"
        ).collect()
    ]
    assert got == want
