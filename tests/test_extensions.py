"""Session-extension plugin (parity: the reference's IcebergExtensionCodec
extension point, serde/mod.rs:90): compile ext/EngineExtensions.scala
offline with pyspark's bundled scala-compiler, boot a FRESH session with
``spark.sql.extensions``, and assert both injections took effect — the
injected native function resolves and the injected optimizer rule
rewrites plans."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from datafusion_ballista_dhruvil_spark.ext import (
    build_extension_jar,
    scala_compiler_available,
)


@pytest.mark.skipif(
    not scala_compiler_available(), reason="pyspark build lacks scala-compiler jar"
)
def test_extension_injects_function_and_rule(tmp_path):
    jar = build_extension_jar(str(tmp_path))
    # spark.sql.extensions is consumed at session construction and
    # extraClassPath at JVM launch, so the probe needs its own process.
    probe = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
            .appName("ext_test")
            .config("spark.jars", {jar!r})
            .config("spark.driver.extraClassPath", {jar!r})
            .config("spark.sql.extensions", "dbds.ext.EngineExtensions")
            .config("spark.ui.enabled", "false")
            .getOrCreate())
        v = spark.sql("SELECT engine_version() AS v").collect()[0].v
        assert v == "dbds-spark-ext/1.0", v
        # the injected rule must be in the optimizer's extended rule list
        # (Catalyst removes Filter(true) on its own, so plan shape alone
        # would not isolate the injection)
        rules = str(
            spark._jsparkSession.sessionState()
            .optimizer()
            .extendedOperatorOptimizationRules()
        )
        assert "DropTrueFilter" in rules, rules
        df = spark.range(10).filter("true").selectExpr("sum(id) AS s")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Filter" not in plan, plan
        assert df.collect()[0].s == 45
        spark.stop()
        print("EXT_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, timeout=300
    )
    assert "EXT_OK" in out.stdout, out.stdout + out.stderr
