"""Operator/query coverage modules.

Each module registers named queries into ``registry.QUERIES`` (PySpark
DataFrame builders) and ``registry.ORACLES`` (equivalent DuckDB ANSI SQL).
``load_all()`` imports everything so the registry is fully populated.
"""

from __future__ import annotations


def load_all() -> None:
    from datafusion_ballista_dhruvil_spark.functions import udf  # noqa: F401
    from datafusion_ballista_dhruvil_spark.operators import (  # noqa: F401
        connectors,
        dedup,
        h2o,
        lifecycle,
        multimodal,
        profiling,
        relational,
        sampling,
        scale,
        similarity,
        ssb,
        temporal,
        text,
        tpcds,
        tpch,
    )
    from datafusion_ballista_dhruvil_spark.streaming import events  # noqa: F401

    from datafusion_ballista_dhruvil_spark.operators import registry

    # export_ordered silently keeps only names present in QUERIES, so a
    # typo in EXPORT_PRIORITY would cost a driver-verdict slot with no
    # error. Fail loudly instead.
    unknown = set(registry.EXPORT_PRIORITY) - set(registry.QUERIES)
    assert not unknown, f"EXPORT_PRIORITY names not in QUERIES: {sorted(unknown)}"
