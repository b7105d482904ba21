"""Codegen-crash auto-fallback (VERDICT r3 item 3).

A known backend fault crashes the remote TPU worker for certain capacity
schedules with the fused scoring attention enabled (deterministic repro +
bisection: tools/repro_sched_crash.py).  Measured on the real chip
(round 4): the raised ``JaxRuntimeError`` ("TPU worker process crashed or
restarted") IS catchable but the in-process jax client is poisoned — every
later dispatch fails the same way — so the mitigation re-execs the driver
with ``MADTP_NO_FUSED_ATTN=1`` once the worker is back.  These tests pin
the wrapper's decision logic with a simulated crash (the real-chip
end-to-end run is recorded in COVERAGE.md)."""

import os
import sys

import pytest


class _FakeCrash(Exception):
    def __str__(self):
        return ("UNAVAILABLE: TPU worker process crashed or restarted. "
                "This can be caused by a kernel fault")


def _install(monkeypatch, tmp_path, *, reachable=True, argv=None):
    from madtp_tpu.cli import common

    calls = {}
    monkeypatch.setattr(common, "backend_reachable",
                        lambda *a, **k: reachable)

    def fake_execve(exe, argv, env):
        calls["exe"], calls["argv"], calls["env"] = exe, argv, env
        raise SystemExit(0)  # execve never returns; emulate process swap

    monkeypatch.setattr(os, "execve", fake_execve)
    monkeypatch.setattr(sys, "argv", argv or
                        ["x", "--output_dir", str(tmp_path), "--fast_eval"])
    monkeypatch.delenv("MADTP_NO_FUSED_ATTN", raising=False)
    monkeypatch.delenv("MADTP_CRASH_FALLBACK", raising=False)
    return calls


def test_crash_reexecs_with_fused_attn_disabled(tmp_path, monkeypatch):
    from madtp_tpu.cli.common import codegen_crash_autofallback

    calls = _install(monkeypatch, tmp_path)

    @codegen_crash_autofallback
    def main():
        raise _FakeCrash()

    with pytest.raises(SystemExit):
        main()
    assert calls["env"]["MADTP_NO_FUSED_ATTN"] == "1"
    assert calls["env"]["MADTP_CRASH_FALLBACK"] == "1"
    assert calls["argv"][0] == sys.executable
    assert calls["argv"][1:] == sys.argv  # same driver invocation


def test_crash_appends_resume_when_checkpoint_exists(tmp_path, monkeypatch):
    from madtp_tpu.cli.common import codegen_crash_autofallback

    os.makedirs(tmp_path / "resume_ckpt")
    calls = _install(monkeypatch, tmp_path)

    @codegen_crash_autofallback
    def main():
        raise _FakeCrash()

    with pytest.raises(SystemExit):
        main()
    i = calls["argv"].index("--resume")
    assert calls["argv"][i + 1] == str(tmp_path / "resume_ckpt")


def test_no_reexec_when_fused_attn_already_off(tmp_path, monkeypatch):
    """A crash WITHOUT the fused kernel is a different bug: re-raise."""
    from madtp_tpu.cli.common import codegen_crash_autofallback

    _install(monkeypatch, tmp_path)
    monkeypatch.setenv("MADTP_NO_FUSED_ATTN", "1")

    @codegen_crash_autofallback
    def main():
        raise _FakeCrash()

    with pytest.raises(_FakeCrash):
        main()


def test_unrelated_errors_pass_through(tmp_path, monkeypatch):
    from madtp_tpu.cli.common import codegen_crash_autofallback

    _install(monkeypatch, tmp_path)

    @codegen_crash_autofallback
    def main():
        raise ValueError("some user error")

    with pytest.raises(ValueError):
        main()


def test_backend_never_recovers_raises(tmp_path, monkeypatch):
    from madtp_tpu.cli.common import codegen_crash_autofallback

    _install(monkeypatch, tmp_path, reachable=False)

    @codegen_crash_autofallback
    def main():
        raise _FakeCrash()

    with pytest.raises(RuntimeError, match="MADTP_NO_FUSED_ATTN"):
        main()


def test_forced_caps_env_override(monkeypatch):
    """MADTP_FORCE_CAPS_V/T override the calibrated schedule (operational
    escape + the crash-guard fault-injection hook)."""
    import numpy as np

    from madtp_tpu.cli.common import fast_capacity_schedule

    vk = np.asarray([[300, 250, 200]])
    tk = np.asarray([[20, 18, 16]])
    monkeypatch.setenv("MADTP_FORCE_CAPS_V", "256,256,128")
    cv, ct = fast_capacity_schedule(vk, tk, "ceil")
    assert cv == (256, 256, 128)
    assert ct is not None and len(ct) == 3  # text stays calibrated

    monkeypatch.setenv("MADTP_FORCE_CAPS_V", "256,128")  # wrong length
    with pytest.raises(SystemExit, match="3"):
        fast_capacity_schedule(vk, tk, "ceil")
