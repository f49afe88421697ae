"""Driver-entry contract tests (__graft_entry__.py).

The multichip dryrun artifact failed in rounds 1 AND 2 for the same class of
bug: the child process meant to run on a virtual CPU mesh inherited enough
environment for the axon TPU plugin to hijack it (r1: JAX_PLATFORMS not
forced before jax init; r2: PALLAS_AXON_POOL_IPS left set, whose
sitecustomize hook re-registers the plugin and overrides jax_platforms
programmatically). Pin the child-env contract so it cannot regress silently.
"""

import subprocess
import sys


def test_dryrun_child_env_is_isolated(monkeypatch):
    import __graft_entry__ as GE

    # dirty parent environment, as under the axon driver
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("XLA_FLAGS", "--some_tpu_specific_flag=1")
    monkeypatch.setenv("JAX_PLATFORM_NAME", "axon")

    captured = {}

    class _Result:
        returncode = 0
        stdout = "dryrun_multichip(8) OK (stubbed)"
        stderr = ""

    def fake_run(cmd, env=None, **kwargs):
        captured["cmd"] = cmd
        captured["env"] = env
        return _Result()

    monkeypatch.setattr(subprocess, "run", fake_run)
    GE.dryrun_multichip(8)

    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "JAX_PLATFORM_NAME" not in env
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"
    assert captured["cmd"][0] == sys.executable
    assert captured["cmd"][1:] == [
        GE.os.path.abspath(GE.__file__), "--dryrun", "8", "--flagship"
    ]


def test_dryrun_raises_on_child_failure(monkeypatch):
    import __graft_entry__ as GE

    class _Fail:
        returncode = 3
        stdout = ""
        stderr = "boom"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Fail())
    try:
        GE.dryrun_multichip(4)
    except RuntimeError as e:
        assert "rc=3" in str(e)
    else:
        raise AssertionError("child failure must propagate")
