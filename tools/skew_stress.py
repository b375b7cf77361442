"""Zipf-skew stress: materialize a SKEWED copy-stress corpus and compare
the dedup/text/event kernels against the uniform corpus of the same
volume (VERDICT r6 #8).

The uniform stress axis (tools/scale_stress.py) grows volume and
vocabulary evenly, so the MAX_BUCKET_DOCS caps and AQE skew handling
never actually bind. This tool builds the degenerate corpus those guards
exist for:

- **documents**: ``HOT_PERMILLE/1000`` of all docs have their text
  replaced by one of ``N_TEMPLATES`` hot templates drawn Zipf-ish
  (template_id = floor(T * u^S) for a per-doc deterministic uniform u —
  density ~ tid^(1/S - 1), so template 0 alone owns ~T^(-1/S) of the hot
  mass: ~25% for T=64, S=3 → ~7.5% of the WHOLE corpus shares one text).
  At 10x sf0.1 that is a ~3.7k-doc exact/near-dup cluster: every banded
  LSH bucket for it blows past MAX_BUCKET_DOCS=1024, so the
  observe_bucket_cap guard must fire (this tool asserts it does), and
  exact-dedup group sizes become heavy enough for AQE skew handling.
- **events**: user_id collapses through the same power law
  (new = floor(M * (old%M / M)^S)), concentrating ~M^(-1/S) of all
  events (~4.6% for M=10000, S=3) on ONE user — the hot-key shape for
  every user-keyed shuffle in the ev_* family.

Both transforms are pure deterministic column arithmetic, so a SMALL
skewed corpus (built from sf0.01, where the hot cluster stays under the
bucket cap) remains oracle-comparable: run
``SPARK_GRAFT_SF_DIR=/tmp/spark_graft_skew_small python tests/driver_diff.py <names>``
for hash-level correctness under skew. At the big scale the capped
queries intentionally diverge from the uncapped oracle (that is the
guard working), so the big-corpus check here is: bounded runtime vs the
uniform corpus + the cap observers firing loudly.

Usage: python tools/skew_stress.py [out_dir] [query ...]
       SCALE_STRESS_COPIES=10 (shared with scale_stress)
"""

from __future__ import annotations

import logging
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tools import scale_stress  # noqa: E402  (TABLES/DIM_TABLES/build reuse)

SRC = os.environ.get("SKEW_STRESS_SRC", "/root/testdata/sf0.1")
COPIES = scale_stress.COPIES
OFFSET = scale_stress.OFFSET

HOT_PERMILLE = 300   # 30% of docs are template pages
N_TEMPLATES = 64
ZIPF_S = 3           # density ~ tid^(1/S-1); head template ~ T^(-1/S)
USER_MODULUS = 10_000

#: queries timed on uniform-vs-skew corpora of identical volume. Chosen
#: for where skew actually lands: banded-bucket candidate generation
#: (caps), groupBy text/token hot keys, user-keyed event shuffles.
SKEW_QUERIES = [
    "dedup_exact",             # giant hash-collapse groups
    "dedup_minhash_lsh",       # band buckets >> cap → truncation guard
    "dedup_simhash_pairs",     # same, simhash banding
    "dedup_lsh_tuning_curve",  # fixed-size sample; skew should NOT move it
    "dedup_entity_blocking",   # blocking-key mega-blocks
    "dedup_bucket_skew_audit", # the audit built for exactly this corpus
    "dedup_cluster_cc",        # one giant connected component
    "text_bigram_lm_score",    # hot-token count joins
    "text_tfidf_topterms",     # document-frequency hot terms
    "ev_decay_weighted",       # user-keyed agg under Zipf users
    "ev_ab_chisquare",         # user-keyed shuffle + 4-counter agg
    "ev_sessionize",           # per-user window over the hot user's 46k rows
]


def build_skew(spark, out_dir: str, src: str = SRC, copies: int = COPIES) -> None:
    """Write the skewed documents/events, then delegate every other table
    to scale_stress.build (which skips files that already exist)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs_dst = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(docs_dst):
        base = spark.read.parquet(os.path.join(src, "documents.parquet"))
        templates = (
            base.orderBy("doc_id")
            .limit(N_TEMPLATES)
            .select(
                F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
                F.col("text").alias("template_text"),
            )
            .withColumn("tid", F.col("rn") - F.lit(1))
            .drop("rn")
        )
        parts = []
        for i in range(copies):
            d = base.withColumn("doc_id", F.col("doc_id") + i * OFFSET)
            parts.append(d)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionAll(p)
        # deterministic hot assignment + Zipf-ish template choice
        big = (
            big.withColumn("_h", F.pmod(F.xxhash64("doc_id"), F.lit(1000)))
            .withColumn(
                "_u",
                F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(100_000))
                / F.lit(100_000.0),
            )
            .withColumn(
                "tid",
                F.when(
                    F.col("_h") < HOT_PERMILLE,
                    F.floor(F.lit(N_TEMPLATES) * F.pow("_u", F.lit(ZIPF_S))).cast("int"),
                ),
            )
        )
        skewed = (
            big.join(F.broadcast(templates), "tid", "left")
            .withColumn("text", F.coalesce("template_text", "text"))
            .drop("tid", "_h", "_u", "template_text")
        )
        skewed.write.mode("overwrite").parquet(docs_dst)

    events_dst = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(events_dst):
        base = spark.read.parquet(os.path.join(src, "events.parquet"))
        parts = []
        for i in range(copies):
            parts.append(base.withColumn("event_id", F.col("event_id") + i * OFFSET))
        big = parts[0]
        for p in parts[1:]:
            big = big.unionAll(p)
        skewed = big.withColumn(
            "user_id",
            F.floor(
                F.lit(USER_MODULUS)
                * F.pow(
                    F.pmod("user_id", F.lit(USER_MODULUS)) / F.lit(float(USER_MODULUS)),
                    F.lit(ZIPF_S),
                )
            ).cast(big.schema["user_id"].dataType),
        )
        skewed.write.mode("overwrite").parquet(events_dst)

    # remaining fact copies + dims — scale_stress skips the two files above
    prev_src = scale_stress.SRC
    try:
        scale_stress.SRC = src
        scale_stress.build(spark, out_dir)
    finally:
        scale_stress.SRC = prev_src


class _CapRecorder(logging.Handler):
    """Collects the observe_bucket_cap WARNING lines per query."""

    def __init__(self) -> None:
        super().__init__(level=logging.WARNING)
        self.lines: list[str] = []

    def emit(self, record: logging.LogRecord) -> None:  # noqa: D102
        msg = record.getMessage()
        if "MAX_BUCKET_DOCS" in msg:
            self.lines.append(msg)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_dir = args[0] if args else "/tmp/spark_graft_skew"
    only = args[1:]

    from datafusion_ballista_dhruvil_spark.operators import load_all
    from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
    from datafusion_ballista_dhruvil_spark.session import create_session

    spark = create_session(app_name="skew-stress")
    load_all()

    uniform_dir = "/tmp/spark_graft_skew_uniform"
    # ADVICE r7 #4: only ever delete directories THIS RUN created — a
    # user-supplied out_dir that already exists (possibly holding other
    # data) is kept, along with whatever we wrote inside it.
    created = [out_dir] if not os.path.exists(out_dir) else []
    # ADVICE r8 #2: uniform_dir's path is tool-owned (fixed literal, never
    # user-supplied), so clean it UNCONDITIONALLY — both at start (a dir
    # left by a crashed or SCALE_STRESS_KEEP=1 prior run would otherwise
    # make build() silently trust half-written tables — the r8 31.7x-bogus
    # trap) and at end (it must not accumulate across runs).
    shutil.rmtree(uniform_dir, ignore_errors=True)
    os.makedirs(uniform_dir, exist_ok=True)
    t0 = time.perf_counter()
    build_skew(spark, out_dir)
    prev = scale_stress.SRC
    try:
        scale_stress.SRC = SRC
        scale_stress.build(spark, uniform_dir)
    finally:
        scale_stress.SRC = prev
    print(f"build: {time.perf_counter() - t0:.1f}s -> {out_dir} (skew), "
          f"{uniform_dir} (uniform), copies={COPIES}")

    rec = _CapRecorder()
    logging.getLogger(
        "datafusion_ballista_dhruvil_spark.operators.dedup"
    ).addHandler(rec)

    print(f"| query | uniform {COPIES}x | skew {COPIES}x | skew/uniform | caps |")
    print("|---|---|---|---|---|")
    for name in (only or SKEW_QUERIES):
        fn = QUERIES[name]
        fn(spark, uniform_dir).collect()  # warm
        t0 = time.perf_counter()
        fn(spark, uniform_dir).collect()
        uni = time.perf_counter() - t0
        rec.lines.clear()
        fn(spark, out_dir).collect()      # warm (also triggers observers)
        t0 = time.perf_counter()
        fn(spark, out_dir).collect()
        skw = time.perf_counter() - t0
        time.sleep(0.3)  # observer daemon threads log post-action
        capped = "CAPPED" if rec.lines else ""
        print(f"| {name} | {uni:.2f} | {skw:.2f} | {skw / uni:.2f}x | {capped} |")
        for line in rec.lines[:2]:
            print(f"|   ^ {line[:110]} |")
    if os.environ.get("SCALE_STRESS_KEEP") != "1":
        for d in created:
            shutil.rmtree(d, ignore_errors=True)
        # tool-owned path: always cleaned, regardless of who created it
        shutil.rmtree(uniform_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
