"""UDF plugin loading parity (SURVEY.md §2.8).

The reference loads scalar UDFs from dynamic libraries via a plugin dir
(`UDFPlugin` trait, .so loading — /root/reference/ballista/core/src/plugin/
udf.rs:29-45, plugin/mod.rs:36-110, config `plugin_dir`). The Spark-native
equivalent is shipping a Python module/zip through ``spark.submit.pyFiles``
(or ``--py-files``): the module lands on the driver's and every executor's
import path, and its functions register as session UDFs.

This test proves the path EXECUTABLY (COVERAGE.md §2.8 was previously
"documented only"): it packages a plugin zip, starts a FRESH SparkSession in
a subprocess with ``spark.submit.pyFiles`` pointing at the zip and a scrubbed
PYTHONPATH, imports the plugin, registers its UDF, and evaluates it on
executors (sum over range forces worker-side unpickling, which needs the
module importable on workers).
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

PLUGIN_SRC = '''\
"""Tiny UDF plugin shipped as a pyFiles zip (reference: UDFPlugin trait)."""


def plugin_double(x):
    return None if x is None else x * 2


def register(spark):
    from pyspark.sql.types import LongType

    spark.udf.register("plugin_double", plugin_double, LongType())
'''

DRIVER_SRC = '''\
import sys

from pyspark.sql import SparkSession

zip_path = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("udf-plugin-test")
    .config("spark.submit.pyFiles", zip_path)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import my_udf_plugin  # importable ONLY via the pyFiles zip

my_udf_plugin.register(spark)
# sum over range -> evaluated on executor python workers, which must
# unpickle the by-reference function via the shipped zip
row = spark.sql("SELECT sum(plugin_double(id)) AS s FROM range(100)").collect()[0]
print("PLUGIN_RESULT", row.s)
spark.stop()
'''


def test_pyfiles_udf_plugin(tmp_path):
    zip_path = tmp_path / "my_udf_plugin.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("my_udf_plugin.py", PLUGIN_SRC)
    driver = tmp_path / "plugin_driver.py"
    driver.write_text(DRIVER_SRC)

    env = dict(os.environ)
    # the plugin must be reachable through the pyFiles mechanism alone
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, str(driver), str(zip_path)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # sum(2*i for i in range(100)) = 9900
    assert "PLUGIN_RESULT 9900" in proc.stdout
