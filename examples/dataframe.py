"""DataFrame API example (parity: reference examples/src/bin/dataframe.rs —
read parquet, select columns, filter, collect).

Run: python examples/dataframe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.context import BallistaSparkContext


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ctx = BallistaSparkContext()
    df = (
        ctx.read_parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .filter(F.col("l_quantity") > 40)
        .orderBy("l_orderkey", "l_quantity")
        .limit(10)
    )
    df.show()
    ctx.spark.stop()


if __name__ == "__main__":
    main()
