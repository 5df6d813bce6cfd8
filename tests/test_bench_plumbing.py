"""bench.py subprocess-isolation plumbing (no TPU/backend touched).

The real workloads run on hardware only; here we verify the worker
round-trip (spawn -> JSON line -> parsed float), the failure shape, and the
global-deadline skip path (VERDICT r3 weak #1: the driver bench must always
leave a parseable record).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _deadline(sec: float = 120.0) -> float:
    return time.monotonic() + sec


def test_echo_worker_roundtrip():
    rec = bench._run_isolated("echo", _deadline())
    assert isinstance(rec, dict) and rec["value"] == 42.0


def test_last_hb_extraction():
    assert bench._last_hb(None) == ""
    assert bench._last_hb("no heartbeats here") == ""
    text = "[hb] 01:02:03 start\nnoise\n[hb] 01:02:09 compiled; measuring\n"
    assert bench._last_hb(text) == "[hb] 01:02:09 compiled; measuring"
    assert bench._last_hb(text.encode()) == "[hb] 01:02:09 compiled; measuring"


def test_failure_string_carries_heartbeat(tmp_path, monkeypatch):
    # a worker that heartbeats then dies: the failure string must say where
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import sys\n"
        "print('[hb] 00:00:01 compiling dip', file=sys.stderr)\n"
        "sys.exit(3)\n")
    monkeypatch.setattr(bench, "__file__", str(bad))
    res = bench._run_isolated("echo", _deadline(), attempts=1)
    assert isinstance(res, str) and res.startswith("failed:")
    assert "compiling dip" in res


def test_worker_failure_returns_string(monkeypatch, tmp_path):
    # point the child at a script that dies immediately
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)")
    monkeypatch.setattr(bench, "__file__", str(bad))
    res = bench._run_isolated("echo", _deadline(), attempts=1)
    assert isinstance(res, str) and res.startswith("failed:")


def test_expired_deadline_skips_without_spawning(monkeypatch):
    # a spawn after the deadline would be a bug — make it loud
    def boom(*a, **k):
        raise AssertionError("subprocess spawned past the deadline")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    res = bench._run_isolated("echo", time.monotonic() - 1)
    assert isinstance(res, str) and res.startswith("skipped: deadline")


def test_worker_timeout_not_retried(monkeypatch, tmp_path):
    # a hung worker (tunnel down) must not be retried — move on and record
    slow = tmp_path / "slow.py"
    slow.write_text("import time; time.sleep(60)")
    monkeypatch.setattr(bench, "__file__", str(slow))
    monkeypatch.setattr(bench, "_MIN_WORKER_BUDGET", 1)
    t0 = time.monotonic()
    res = bench._run_isolated("echo", _deadline(), attempts=2, timeout=2)
    assert time.monotonic() - t0 < 20
    assert isinstance(res, str) and res.startswith("failed: timeout")
