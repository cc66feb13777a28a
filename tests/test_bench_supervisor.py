"""bench.py hang-hardening: the jax-free parent must relay a good child,
retry a wedged/failed first attempt once, and fail loudly after two."""

import subprocess
import sys
import types

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as mod

    yield mod
    sys.path.remove("/root/repo")


def _proc(rc=0, out="", err=""):
    return types.SimpleNamespace(returncode=rc, stdout=out, stderr=err)


def test_success_passthrough(bench, monkeypatch, capsys):
    monkeypatch.setattr(
        bench.subprocess, "run", lambda *a, **k: _proc(0, '{"value": 1}\n')
    )
    assert bench._supervise() == 0
    assert capsys.readouterr().out == '{"value": 1}\n'


def test_timeout_then_success(bench, monkeypatch, capsys):
    calls = []

    def run(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
        return _proc(0, '{"value": 2}\n')

    monkeypatch.setattr(bench.subprocess, "run", run)
    assert bench._supervise() == 0
    cap = capsys.readouterr()
    assert cap.out == '{"value": 2}\n'
    assert "retrying in a fresh process" in cap.err
    assert len(calls) == 2


def test_two_failures_exit_nonzero(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: _proc(7, "", "boom"))
    assert bench._supervise() == 1
    assert "exited 7" in capsys.readouterr().err
