"""Property-based conformance for the min-label-propagation components
kernel (min_label_components, the iterative Pregel-style stage behind
dedup_cluster_cc) against a union-find oracle.

The fuzz forces the shapes that stress label propagation: long chains
(rounds ~ diameter, so convergence must actually iterate), stars, cycles,
self-loops, duplicate and reversed edges, and disconnected singletons
appearing only as one edge endpoint.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.dedup import (
    min_label_components,
)

edge = st.tuples(st.integers(0, 14), st.integers(0, 14))
graph = st.lists(edge, min_size=1, max_size=25)
# a deterministic long chain appended sometimes — the worst diameter case
chain = st.booleans()


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(graph, chain)
def test_min_label_components_matches_union_find(spark, edges, add_chain):
    if add_chain:
        edges = edges + [(i + 100, i + 101) for i in range(8)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {
        r.doc_id: r.label for r in min_label_components(pairs).collect()
    }
    assert got == _union_find(edges)
