"""SQL example (parity: reference examples/src/bin/sql.rs — register a
table, run SQL with aggregation, show results). Demonstrates the dialect
layer: DataFusion-style ``::`` casts and approx_distinct run unmodified.

Run: python examples/sql.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datafusion_ballista_dhruvil_spark.context import BallistaSparkContext


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ctx = BallistaSparkContext()
    ctx.register_parquet("orders", f"{sf_dir}/orders.parquet")
    ctx.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               approx_distinct(o_custkey) AS customers,
               avg(o_totalprice)::DECIMAL(18,2) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    ).show()
    ctx.spark.stop()


if __name__ == "__main__":
    main()
