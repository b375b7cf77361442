"""Similarity search over embedding columns (north-star extensions;
BASELINE.json): brute-force cosine top-k baseline, bucketed-ANN scale path,
and embedding-cosine near-duplicate detection.

Vectors are ``array<float>`` columns; all arithmetic runs JVM-side through
``zip_with`` + ``aggregate`` higher-order functions (no Python). Dot products
accumulate in exact DECIMAL so results are bit-reproducible across engines
and partitionings (same determinism contract as the money math — see
functions/compat.py; the scale-6 reduction before the double cast avoids
DuckDB's int128 double-rounding).

Scale posture at 100 TB:
- norms are precomputed ONCE per row before any join (norm work is O(N),
  pair work is O(pairs) x one dot product — recomputing norms per pair
  costs more than every dot product combined);
- brute-force top-k: O(|Q| x |corpus|) — correct baseline, used with small
  query sets or as the per-bucket kernel;
- bucketed ANN (sim_ann_bucketed): rank-LSH code computed map-side; the join
  is an equi-join on the bucket code, so each query only scans its bucket.
  Swap-in point for IVF centroids: replace the code expression with
  argmin-centroid assignment, same join shape;
- near-dup: blocked all-pairs inside a partition key (label here; any
  clustering key in production) — never global all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables

_DEC = "decimal(15,9)"
_ACC = "decimal(38,18)"


def dot(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two float arrays, surfaced as DOUBLE."""
    # widen float->double BEFORE the decimal cast: casting float32 directly
    # to decimal goes through float arithmetic in some engines (DuckDB) and
    # picks up ~1e-8 noise; float->double is exact everywhere.
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double").cast(_DEC) * y.cast("double").cast(_DEC)
    )
    # Spark's decimal-add widens precision past 38, so the fold re-casts the
    # accumulator each step; the ~1e-17 rounding this admits is far below
    # the scale-6 reduction used for the surfaced double.
    s = F.aggregate(prods, F.lit(0).cast(_ACC), lambda acc, v: (acc + v).cast(_ACC))
    return s.cast("decimal(38,6)").cast("double")


def norm(a: Column) -> Column:
    """sqrt(<a,a>) — precompute per row, never per pair."""
    return F.sqrt(dot(a, a))


_SQL_DOT = (
    "CAST(round(list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(CAST(x[1] AS DOUBLE) AS DECIMAL(15,9))"
    " * CAST(CAST(x[2] AS DOUBLE) AS DECIMAL(15,9)))), 6) AS DOUBLE)"
)


def _sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


_SQL_NORM = f"sqrt({_SQL_DOT.format(a='{e}', b='{e}')})"


def _sql_norm(e: str) -> str:
    return _SQL_NORM.format(e=e)


# --------------------------------------------------------------------------
@query(
    "sim_cosine_topk",
    oracle=f"""
WITH c AS (SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id, embedding, nrm FROM c WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM q, c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
    AS rn
  FROM scored
) r WHERE rn <= 5
ORDER BY query_id, cosine DESC, neighbor_id
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for a query set (ANN baseline).

    Norms precomputed per row; queries broadcast against the corpus (at
    scale: corpus stays partitioned, queries ship to every executor — no
    corpus shuffle).
    """
    t = Tables(spark, sf_dir)
    corpus = t.embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        norm(F.col("embedding")).alias("cn"),
    )
    q = (
        t.embeddings.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            norm(F.col("embedding")).alias("qn"),
        )
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "neighbor_id")
    )


# --------------------------------------------------------------------------
_SQL_CODE = (
    "CAST(CASE WHEN {e}[1] > {e}[2] THEN 8 ELSE 0 END"
    " + CASE WHEN {e}[3] > {e}[4] THEN 4 ELSE 0 END"
    " + CASE WHEN {e}[5] > {e}[6] THEN 2 ELSE 0 END"
    " + CASE WHEN {e}[7] > {e}[8] THEN 1 ELSE 0 END AS INT)"
)


def _code(e: Column) -> Column:
    bits = [
        F.when(F.element_at(e, 2 * k + 1) > F.element_at(e, 2 * k + 2), 1 << (3 - k)).otherwise(0)
        for k in range(4)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


@query(
    "sim_ann_bucketed",
    oracle=f"""
WITH coded AS (
  SELECT vec_id, embedding, {_SQL_CODE.format(e='embedding')} AS bucket,
         {_sql_norm('embedding')} AS nrm
  FROM embeddings
),
q AS (SELECT * FROM coded WHERE vec_id < 20),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
         {_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM q JOIN coded c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, bucket, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
    AS rn
  FROM scored
) r WHERE rn <= 3
ORDER BY query_id, cosine DESC, neighbor_id
""",
)
def sim_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via rank-LSH bucketing (the scale path).

    A 4-bit code from pairwise dimension comparisons partitions the corpus;
    each query joins only its bucket (equi-join -> shuffle-hash join on the
    code). IVF drop-in: replace the code with nearest-centroid id.
    """
    t = Tables(spark, sf_dir)
    coded = t.embeddings.select(
        "vec_id",
        "embedding",
        _code(F.col("embedding")).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = coded.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket"),
        F.col("nrm").alias("qn"),
    )
    c = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cbucket"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        q.join(
            c,
            (F.col("bucket") == F.col("cbucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "bucket",
            "neighbor_id",
            (dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("query_id", "bucket", "neighbor_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "neighbor_id")
    )


# --------------------------------------------------------------------------
@query(
    "sim_embedding_neardup",
    oracle=f"""
WITH lbl AS (
  SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm
  FROM embeddings WHERE label = 0
)
SELECT d1, d2, cosine FROM (
  SELECT a.vec_id AS d1, b.vec_id AS d2,
         {_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
  FROM lbl a JOIN lbl b ON a.vec_id < b.vec_id
) p
WHERE cosine >= 0.25
ORDER BY cosine DESC, d1, d2
LIMIT 100
""",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by a partition key.

    All-pairs comparison runs only inside each block (label here; in a real
    pipeline the block key is an LSH bucket or cluster id), which is what
    keeps the quadratic term bounded at 100 TB.
    """
    t = Tables(spark, sf_dir)
    lbl = t.embeddings.where(F.col("label") == 0).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = lbl.select(
        F.col("vec_id").alias("d1"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = lbl.select(
        F.col("vec_id").alias("d2"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("d1") < F.col("d2")).select(
        "d1",
        "d2",
        (dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
    )
    return (
        pairs.where(F.col("cosine") >= 0.25)
        .orderBy(F.desc("cosine"), "d1", "d2")
        .limit(100)
    )
