"""Property-based transparency for salted_join — the explicit skew tool
must be a pure physical rewrite: for every allowed join type its output
multiset equals the plain join's, including NULL keys (never matching),
duplicate keys on both sides (multiplicities multiply), and one-sided
keys (left rows surviving with NULL payload under left joins).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.scale import salted_join

key = st.one_of(st.none(), st.integers(0, 4))
fact_rows = st.lists(
    st.tuples(key, st.integers(0, 99)), min_size=1, max_size=15
)
dim_rows = st.lists(
    st.tuples(key, st.integers(100, 199)), min_size=0, max_size=8
)
case = st.tuples(
    fact_rows,
    dim_rows,
    st.sampled_from(["inner", "left", "left_semi"]),
    st.integers(1, 5),  # salt
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(case)
def test_salted_join_equals_plain_join(spark, case_):
    frows, drows, how, salt = case_
    fact = spark.createDataFrame(frows, "k long, v long")
    dim = spark.createDataFrame(drows, "dk long, w long")

    def canon(df):
        # None-safe multiset compare (left joins emit NULL payload cells)
        return sorted(
            tuple((v is None, v) for v in r) for r in df.collect()
        )

    got = canon(salted_join(fact, dim, "k", "dk", salt=salt, how=how))
    want = canon(fact.join(dim, fact["k"] == dim["dk"], how))
    assert got == want
