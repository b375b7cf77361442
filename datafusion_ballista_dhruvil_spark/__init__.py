"""PySpark-native analytics engine with the query/data-processing surface of
dhruvils414/datafusion-ballista-dhruvil (Apache Arrow Ballista 0.12 fork).

The reference is a distributed SQL engine (client -> scheduler -> executors,
Arrow IPC shuffle, Arrow Flight results; see /root/reference README.md:30-44).
Everything its distributed layer builds by hand (ShuffleWriterExec,
ShuffleReaderExec, ExecutionGraph, task scheduling, fault tolerance) is what
Spark provides natively, so this package implements only:

- the user-facing API surface (``context.BallistaSparkContext``),
- the relational operator/function/query coverage (``operators/``),
- sources/sinks (``sources/``),
- SQL dialect + function-name compatibility (``functions/``),
- plan inspection utilities (``plans/``),
- plus large-scale training-data-pipeline operators that go beyond the
  reference surface (dedup, similarity search, text analysis, multimodal).

Design rules (applied throughout):
- DataFrame/SQL first; Catalyst owns physical planning.
- Exact-decimal money math so results are deterministic and reproducible
  across engines and partitionings (see ``functions.compat``).
- Broadcast tiny dimensions, let AQE handle the rest; no collect() loops.
"""

from datafusion_ballista_dhruvil_spark.session import create_session, register_tables

__all__ = ["create_session", "register_tables"]
__version__ = "0.1.0"
