"""Pin the XLA:CPU shard_map-grad-of-cond bug that forces the sharded
train step onto the cond-free graph on CPU meshes (sharding.py).

The probe differentiates the bounce_skip=True graph under shard_map on
an 8-device CPU mesh WITHOUT the workaround.  Today that heap-corrupts
the process (segfault/abort), so the test is strict-xfail: the day a
JAX/XLA upgrade makes the probe pass, this test XPASSes and fails the
suite — the signal to delete the CPU forcing in train_step_sharded.
"""

import pathlib
import subprocess
import sys

import pytest

REPRO = pathlib.Path(__file__).resolve().parents[1] / "scripts" / \
    "repro_shard_skip.py"


@pytest.mark.xfail(strict=True,
                   reason="XLA:CPU heap corruption: grad of lax.cond "
                          "bounce skips under shard_map (see "
                          "sharding.py train_step_sharded)")
def test_cond_skip_grad_under_shardmap_cpu():
    r = subprocess.run([sys.executable, str(REPRO), "4", "1", "2"],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (
        f"probe crashed (exit {r.returncode}) — expected while the XLA "
        f"bug stands: {r.stderr[-300:]}")
