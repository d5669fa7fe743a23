"""Driver gates: __graft_entry__.entry() must jit single-chip and
dryrun_multichip must execute a real 8-way sharded render + train step.

These run in a subprocess with a genuine 8-device virtual CPU mesh so a
process-fatal failure (the XLA:CPU shard_map-grad heap corruption was
one) fails the test instead of killing the pytest run."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run(code: str) -> subprocess.CompletedProcess:
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.run(
        [sys.executable, "-c", code], cwd=str(REPO), env=env,
        capture_output=True, text=True, timeout=600)


def test_entry_compiles_and_runs():
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (256, 3)\n"
        "print('OK')\n")
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    assert "OK" in r.stdout


def test_dryrun_multichip_eight_devices():
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) >= 8, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('OK')\n")
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    assert "OK" in r.stdout
