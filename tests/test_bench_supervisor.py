"""bench.py hang-hardening: the jax-free parent must relay a good child,
retry a wedged/failed first attempt once, and fail loudly after two."""

import subprocess
import sys
import types

import pytest


@pytest.fixture()
def bench():
    # Load bench.py from its explicit path: no sys.path/sys.modules mutation,
    # immune to a pre-imported `bench` from elsewhere (ADVICE r3).
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("_bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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


def test_timeout_relays_partial_child_stderr(bench, monkeypatch, capsys):
    """A wedged child's captured stderr must be relayed, not discarded
    (ADVICE r3): the wedged attempt is the one whose logs matter most."""

    def run(*a, **k):
        raise subprocess.TimeoutExpired(
            cmd="bench", timeout=1, stderr=b"compile started\nrpc stuck\n"
        )

    monkeypatch.setattr(bench.subprocess, "run", run)
    assert bench._supervise() == 1
    err = capsys.readouterr().err
    assert "rpc stuck" in err
    assert "wedged" in err
