"""bench.py::_wait_for_backend — the round-end bench must survive a
transient TPU-claim outage (probe loop) and stay a no-op on CPU."""

import importlib.util
import os
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_for_backend_cpu_noop(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("CPU path must not probe")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    bench._wait_for_backend()


def test_wait_for_backend_retries_then_proceeds(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    probes = []

    def timed_out(*a, **k):
        probes.append(a)
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k.get("timeout"))

    monkeypatch.setattr(bench.subprocess, "run", timed_out)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    t = iter(range(100))
    monkeypatch.setattr(bench.time, "monotonic", lambda: float(next(t)))
    bench._wait_for_backend(max_wait_s=3, probe_timeout_s=1)
    assert len(probes) >= 2  # kept probing until the budget ran out
    assert "attempting the measurement anyway" in capsys.readouterr().err


def test_wait_for_backend_returns_on_success(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    results = iter(
        [types.SimpleNamespace(returncode=1),
         types.SimpleNamespace(returncode=0)]
    )
    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: next(results))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_backend(max_wait_s=600, probe_timeout_s=1)
    assert "up after 2 probes" in capsys.readouterr().err
