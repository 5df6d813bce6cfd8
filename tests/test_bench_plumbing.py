"""bench.py subprocess-isolation plumbing (no TPU/backend touched).

The real workloads run on hardware only; here we verify the worker
round-trip (spawn -> JSON line -> parsed float) and the failure shape.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_echo_worker_roundtrip():
    assert bench._run_isolated("echo") == 42.0


def test_worker_failure_returns_string(monkeypatch, tmp_path):
    # point the child at a script that dies immediately
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)")
    monkeypatch.setattr(bench, "__file__", str(bad))
    res = bench._run_isolated("echo", attempts=1)
    assert isinstance(res, str) and res.startswith("failed:")
