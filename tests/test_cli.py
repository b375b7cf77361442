"""SQL CLI parity tests (reference ballista-cli/): one-shot, REPL, errors."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "4"}
CLI = [sys.executable, "-m", "datafusion_ballista_dhruvil_spark.cli"]


def test_one_shot_query():
    out = subprocess.run(
        CLI + ["-c", "SELECT 40+2 AS answer"],
        capture_output=True, text=True, env=ENV, timeout=180,
    )
    assert out.returncode == 0
    assert "42" in out.stdout


def test_one_shot_with_tables_and_dialect():
    out = subprocess.run(
        CLI + ["--sf-dir", "/root/testdata/sf0.001", "-c",
               "SELECT count(*)::BIGINT AS n FROM region"],
        capture_output=True, text=True, env=ENV, timeout=180,
    )
    assert out.returncode == 0 and "5" in out.stdout


def test_error_exit_code_and_message():
    out = subprocess.run(
        CLI + ["-c", "SELEC nope"],
        capture_output=True, text=True, env=ENV, timeout=180,
    )
    assert out.returncode == 1
    assert "error:" in out.stderr and "PARSE_SYNTAX_ERROR" in out.stderr


def test_repl_dot_commands():
    out = subprocess.run(
        CLI + ["--sf-dir", "/root/testdata/sf0.001"],
        input=".tables\nSELECT 2+2 AS four;\n.quit\n",
        capture_output=True, text=True, env=ENV, timeout=180,
    )
    assert out.returncode == 0
    assert "lineitem" in out.stdout and "4" in out.stdout
