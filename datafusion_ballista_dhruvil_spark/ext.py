"""Engine extension point — parity with the reference's extension codec.

The reference lets a user module extend the engine's plan surface without
forking it: `IcebergExtensionCodec` plugs custom plan nodes into serde
(ballista/core/src/serde/mod.rs:90) and the scheduler honors them. Spark's
native analog is ``SparkSessionExtensions``: a user class injected via
``spark.sql.extensions`` that adds optimizer/planner rules, parsers and
functions at session build time.

``ext/EngineExtensions.scala`` is a working extension module (an injected
native function + an injected optimizer rule); ``build_extension_jar``
compiles it OFFLINE with the scala-compiler jar that ships inside pyspark
— no sbt, no network — so the extension path is buildable and testable in
this container. tests/test_extensions.py boots a fresh session with the
jar and asserts both injections took effect.

Production shape: compile the module once, ship the jar with
``--jars`` + ``--conf spark.sql.extensions=dbds.ext.EngineExtensions``.
"""

from __future__ import annotations

import glob
import os
import subprocess

_PYSPARK_JARS = None


def pyspark_jars_dir() -> str:
    global _PYSPARK_JARS
    if _PYSPARK_JARS is None:
        import pyspark

        _PYSPARK_JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return _PYSPARK_JARS


def scala_compiler_available() -> bool:
    return bool(glob.glob(os.path.join(pyspark_jars_dir(), "scala-compiler-*.jar")))


def build_extension_jar(out_dir: str) -> str:
    """Compile ext/EngineExtensions.scala into ``out_dir`` and return the
    jar path. Uses the scala-compiler jar shipped with pyspark (offline)
    and the JDK's ``jar`` tool."""
    jars = pyspark_jars_dir()
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ext",
        "EngineExtensions.scala",
    )
    classes = os.path.join(out_dir, "classes")
    os.makedirs(classes, exist_ok=True)
    java = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
    jar_tool = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "jar")
    cp = os.path.join(jars, "*")
    subprocess.run(
        [java, "-cp", cp, "scala.tools.nsc.Main", "-classpath", cp,
         "-d", classes, "-nowarn", src],
        check=True,
        capture_output=True,
    )
    out_jar = os.path.join(out_dir, "engine-extensions.jar")
    subprocess.run(
        [jar_tool, "cf", out_jar, "-C", classes, "."],
        check=True,
        capture_output=True,
    )
    return out_jar
