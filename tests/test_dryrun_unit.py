"""Unit tests for the dryrun_multichip orchestration layer.

The real child phases (8-device SPMD compiles) are driver-run and take
minutes on this 1-core host; these tests mock the child subprocesses to
pin the ORCHESTRATION contract instead — retry/fallback flow, loud
skips, and the consolidated DRYRUN_SUMMARY line the artifact tail is
judged by (MULTICHIP_rN.json must be self-describing without grepping
the whole log).
"""

import subprocess

import pytest

import __graft_entry__ as g


class _Proc:
    def __init__(self, stdout, returncode=0, stderr=""):
        self.stdout = stdout
        self.returncode = returncode
        self.stderr = stderr


_MAIN_OUT = ("dryrun_multichip(8): mesh {'data': 4, 'model': 2} "
             "loss 1.091310 slowfast_embed (8, 2304) OK")
_SWEEP_OUT = ("SWEEP_OK losses (8, 1)=1.091314 (2, 4)=1.091310 "
              "(4, 2)=1.091310")
_SFTRAIN_OUT = ("slowfast_train mesh {'data': 4, 'model': 2} batch 8 "
                "loss 1.101987 OK")


def _fake_run(responses):
    """subprocess.run stand-in dispatching on the child's -c code."""

    calls = []

    def run(argv, **kwargs):
        code = argv[-1]
        calls.append(code)
        for key, resp in responses.items():
            if key in code:
                return resp(code) if callable(resp) else resp
        raise AssertionError(f"unexpected child: {code}")

    return run, calls


def test_dryrun_summary_all_ok(monkeypatch, capsys):
    run, calls = _fake_run({
        "_dryrun_impl": _Proc(_MAIN_OUT),
        "_sweep_impl": _Proc(_SWEEP_OUT),
        "_sf_train_impl": _Proc(_SFTRAIN_OUT),
    })
    monkeypatch.setattr(subprocess, "run", run)
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "SWEEP_OK" in out and "slowfast_train" in out
    assert ("DRYRUN_SUMMARY main=OK(4, 2) sweep=OK "
            "slowfast_train=OK") in out
    # main once, sweep once, sf-train once
    assert len(calls) == 3


def test_dryrun_summary_names_skip_reasons(monkeypatch, capsys):
    # Sweep disabled via env; sf-train child aborts twice (rc=134, the
    # 1-core collective-rendezvous signature) -> loud skip, not failure.
    monkeypatch.setenv("AVTEX_DRYRUN_SWEEP", "0")
    run, calls = _fake_run({
        "_dryrun_impl": _Proc(_MAIN_OUT),
        "_sf_train_impl": _Proc("", returncode=134),
    })
    monkeypatch.setattr(subprocess, "run", run)
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert ("DRYRUN_SUMMARY main=OK(4, 2) sweep=DISABLED "
            "slowfast_train=SKIPPED_ABORTS") in out
    assert "WARNING: slowfast train phase skipped" in out
    assert len(calls) == 3  # main + 2 sf-train attempts


def test_dryrun_main_falls_back_to_dp_only(monkeypatch, capsys):
    # TP-mesh child aborts twice -> third attempt runs the DP-only (8,1)
    # mesh; summary reports the shape that actually ran.
    state = {"n": 0}

    def main_resp(code):
        state["n"] += 1
        if "(4, 2)" in code:
            return _Proc("", returncode=134)
        return _Proc("dryrun_multichip(8): mesh {'data': 8} "
                     "loss 1.091314 slowfast_embed (8, 2304) OK")

    run, calls = _fake_run({
        "_dryrun_impl": main_resp,
        "_sweep_impl": _Proc(_SWEEP_OUT),
        "_sf_train_impl": _Proc(_SFTRAIN_OUT),
    })
    monkeypatch.setattr(subprocess, "run", run)
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "[DP-only fallback]" in out
    assert ("DRYRUN_SUMMARY main=OK(8, 1) sweep=OK "
            "slowfast_train=OK") in out


def test_dryrun_sweep_mismatch_raises(monkeypatch):
    run, _ = _fake_run({
        "_dryrun_impl": _Proc(_MAIN_OUT),
        "_sweep_impl": _Proc(
            "SWEEP_MISMATCH losses (8, 1)=1.0 (2, 4)=2.0",
            returncode=1),
    })
    monkeypatch.setattr(subprocess, "run", run)
    with pytest.raises(RuntimeError, match="invariance FAILED"):
        g.dryrun_multichip(8)


def test_dryrun_sftrain_numeric_failure_raises(monkeypatch):
    run, _ = _fake_run({
        "_dryrun_impl": _Proc(_MAIN_OUT),
        "_sweep_impl": _Proc(_SWEEP_OUT),
        "_sf_train_impl": _Proc("NONFINITE loss nan", returncode=1),
    })
    monkeypatch.setattr(subprocess, "run", run)
    with pytest.raises(RuntimeError, match="train step FAILED"):
        g.dryrun_multichip(8)
