"""tools/bench_gate.py decision logic on synthetic timing files — the
per-round regression gate must flag only true >1.5x drifts above the
floor and exit cleanly when nothing regressed."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(prev: dict, cur: dict, tmp_path: Path):
    p1, p2 = tmp_path / "prev.json", tmp_path / "cur.json"
    p1.write_text(json.dumps({"queries": prev}))
    p2.write_text(json.dumps({"queries": cur}))
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_gate.py"), str(p1), str(p2)],
        capture_output=True,
        text=True,
    )


def test_no_regressions_exits_zero(tmp_path):
    r = _run({"a": 1.0, "b": 0.5}, {"a": 1.1, "b": 0.6}, tmp_path)
    assert r.returncode == 0
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["regressions"] == [] and out["flagged"] == 0


def test_below_floor_never_flags(tmp_path):
    # 10x regression but prev under the 0.3s floor: noise territory
    r = _run({"a": 0.05}, {"a": 0.5}, tmp_path)
    assert r.returncode == 0
    assert json.loads(r.stdout.strip().splitlines()[-1])["flagged"] == 0


def test_new_queries_ignored(tmp_path):
    r = _run({"a": 1.0}, {"a": 1.0, "brand_new": 9.9}, tmp_path)
    assert r.returncode == 0
    assert json.loads(r.stdout.strip().splitlines()[-1])["flagged"] == 0
