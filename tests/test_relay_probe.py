"""Relay health probe (tools/relay_probe.py) — CPU smoke tests.

The probe's real target is the remote TPU relay (the three failure modes
in its docstring can only occur there), so these tests only prove the
harness itself: the ladder runs to a HEALTHY verdict on the CPU backend,
tier selection honors --max-mb, and the alarm path classifies a hang.
"""

import signal

import pytest

from objgan_tpu.tools import relay_probe


def test_healthy_ladder_on_cpu(capsys):
    rc = relay_probe.main(["--max-mb", "4", "--timeout", "60"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "tiny matmul ok" in out
    assert "4 MiB device_put ok" in out
    assert "VERDICT: HEALTHY through 4 MiB" in out
    # --max-mb must bound the ladder: no larger tier may have run.
    assert "32 MiB" not in out


def test_timeout_classifies_degraded(monkeypatch, capsys):
    """A device_put that blocks past the alarm must yield the DEGRADED
    verdict and rc 1 (the big-transfer mode)."""
    import jax

    real_put = jax.device_put

    def slow_put(x):
        signal.raise_signal(signal.SIGALRM)  # stand-in for a real hang
        return real_put(x)

    monkeypatch.setattr(jax, "device_put", slow_put)
    rc = relay_probe.main(["--max-mb", "4", "--timeout", "60"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "DEGRADED (big-transfer mode)" in out


def test_alarm_cleared_after_run():
    relay_probe.main(["--max-mb", "4", "--timeout", "60"])
    assert signal.alarm(0) == 0  # no alarm left pending
