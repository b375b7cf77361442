"""Scale-engineering utilities: the techniques that keep joins/aggregations
healthy at 100 TB (SURVEY.md §4.2 / build plan step 4).

The reference handles none of these (no AQE, no skew handling, no spill —
tuning-guide.md); Spark gives AQE for free, and these helpers cover the two
cases AQE can't fix alone:

- **Salted joins** for extreme key skew: AQE's skew-join splits oversized
  *partitions*, but a single hot KEY still lands in one task on the build
  side. Salting fans the hot side out N ways and replicates the dim rows.
- **Bucketed tables** for repeated co-located joins: pre-shuffle once at
  write time (bucketBy), then every future equi-join on the bucket key runs
  exchange-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed fact keys.

    fact rows get a random-but-deterministic salt in [0, salt); dim rows are
    replicated `salt` times. The join key becomes (key, salt), spreading a
    hot key across `salt` tasks. Deterministic: the salt is derived from a
    hash of the full fact row's key + a monotonic component, not rand(),
    so retried tasks produce identical output (Spark task retry safety).

    Cost model: dim side grows by `salt` x — use only when the dim is small
    or pre-filtered, which is exactly the skew scenario (few hot keys).

    Only fact-preserving join types are allowed: right/full outer joins
    would emit each unmatched (replicated) dim row `salt` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — unmatched dim rows would be duplicated {salt}x"
        )
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(fact_key), F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    dim_replicated = dim.select("*", salts)
    joined = fact_salted.join(
        dim_replicated,
        (fact_salted[fact_key] == dim_replicated[dim_key])
        & (fact_salted["__salt"] == dim_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+sorted) managed table: the reference's
    `file_sort_order` / hash-partitioned listing table analogue
    (datafusion.proto:99-115). Joins/aggregations on the bucket columns
    then require no exchange (see tests/test_scale.py plan assertion)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def cohort_join_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key: Catalyst sees the matching
    hash distribution and plans SortMergeJoin WITHOUT exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
