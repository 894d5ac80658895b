"""Backend responsiveness guard (utils/backend.py).

A dead accelerator transport hangs ``jax.devices()`` forever; the guard
probes discovery in a subprocess and pins the process to the CPU backend
when it never answers.  These tests exercise the decision logic with the
probe mocked — the real dead-tunnel path was driven live (CLI, bench,
entry(), dryrun all complete against a genuinely dead relay).
"""

import subprocess

import pytest

from solex_ser_recon_en_tpu.utils import backend


@pytest.fixture(autouse=True)
def fresh_memo(monkeypatch):
    monkeypatch.setattr(backend, "_PROBED", {})


def test_cpu_env_short_circuits(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(backend.subprocess, "run",
                        lambda *a, **k: calls.append(1))
    assert backend.ensure_responsive_backend() is True
    assert calls == []  # no probe subprocess at all


def test_unresponsive_probe_pins_cpu(monkeypatch, capsys):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    def timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(backend.subprocess, "run", timeout)
    import jax

    prev = jax.config.jax_platforms
    try:
        assert backend.ensure_responsive_backend(timeout_s=1) is False
        assert "CPU backend" in capsys.readouterr().err
        assert jax.config.jax_platforms == "cpu"
        # memoised: a second call must not probe again
        monkeypatch.setattr(backend.subprocess, "run",
                            lambda *a, **k: pytest.fail("probed twice"))
        assert backend.ensure_responsive_backend() is False
    finally:
        # restore the session-global config (matters for the real-chip
        # suite mode, where jax_platforms must stay unset)
        jax.config.update("jax_platforms", prev)


def test_responsive_probe_changes_nothing(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(backend.subprocess, "run", lambda *a, **k: None)
    assert backend.ensure_responsive_backend() is True


def test_relay_attached_markers(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("SOLEX_BACKEND_PROBE", raising=False)
    assert backend.relay_attached() is False
    monkeypatch.setenv("SOLEX_BACKEND_PROBE", "1")
    assert backend.relay_attached() is True
