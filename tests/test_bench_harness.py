"""bench.py retry harness: a transient backend outage must not cost the
round its perf record (BENCH_r02.json was rc=1 with a raw traceback when the
axon backend was UNAVAILABLE at capture time)."""

import json
import subprocess
import sys
import types

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class _Args:
    steps = 2
    grid = 0
    updates_per_call = 1


def _proc(stdout="", rc=0, stderr=""):
    p = types.SimpleNamespace()
    p.stdout, p.returncode, p.stderr = stdout, rc, stderr
    return p


def test_retry_returns_value_on_success(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _proc('{"value": 42.5}\n'),
    )
    value, err = bench._measure_with_retries(_Args())
    assert value == 42.5 and err is None


def test_retry_recovers_after_transient_failures(monkeypatch):
    calls = {"n": 0}

    def fake_run(*a, **k):
        calls["n"] += 1
        if calls["n"] < 3:
            return _proc('{"error": "RuntimeError: UNAVAILABLE"}', rc=1)
        return _proc('{"value": 160.0}')

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    value, err = bench._measure_with_retries(_Args())
    assert value == 160.0 and err is None and calls["n"] == 3


def test_retry_exhaustion_reports_structured_error(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: _proc('{"error": "RuntimeError: UNAVAILABLE"}', rc=1),
    )
    value, err = bench._measure_with_retries(_Args())
    assert value is None
    assert "UNAVAILABLE" in err


def test_retry_handles_timeout_and_garbage_output(monkeypatch):
    seq = iter([
        subprocess.TimeoutExpired(cmd="x", timeout=900),
        _proc("not json at all\n", rc=1, stderr="Terminated"),
        _proc('{"value": 158.0}'),
    ])

    def fake_run(*a, **k):
        item = next(seq)
        if isinstance(item, Exception):
            raise item
        return item

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    value, err = bench._measure_with_retries(_Args())
    assert value == 158.0 and err is None


def test_child_flag_roundtrip_emits_json_error_without_backend(monkeypatch):
    # The child must print a single parseable JSON line even when the
    # measurement raises immediately.
    monkeypatch.setattr(
        bench, "measure_pfn_tpu",
        lambda **k: (_ for _ in ()).throw(RuntimeError("backend down")),
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench._measure_child(_Args())
    payload = json.loads(buf.getvalue().strip())
    assert rc == 1 and "backend down" in payload["error"]
