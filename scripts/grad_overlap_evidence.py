"""Evidence for the sharded-grad all-reduce overlap question (VERDICT r3
item 7): measures whether overlapping the grad psum with the backward
bounce loop can matter at all for this workload.

Two facts decide it:

1.  The lowered train_step_sharded HLO carries ONE all-reduce per param
    leaf (pmean over a pytree lowers leaf-wise), not one fused barrier
    after the full backward — each leaf's reduce is schedulable as soon
    as its grad is produced, which on TPU the latency-hiding scheduler
    overlaps with the remaining backward compute automatically.
2.  The entire differentiable-param tree of the bench scenes is tiny
    (tens of KB): at ~100 GB/s ICI per link the all-reduce costs ~1 us,
    vs a backward bounce loop measured in tens of milliseconds — a
    <1e-4 fraction.  There is nothing to overlap.

This script prints both: per-leaf byte counts + all-reduce op count in
the StableHLO for an 8-device mesh, and the us-scale transfer estimate
next to the measured fwd+bwd step time from BENCH_r03.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/grad_overlap_evidence.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax          # noqa: E402  (env must be set first)
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    from simd_raytracer_tpu import RenderConfig, parse_scene_file
    from simd_raytracer_tpu.ops.grad import split_params
    from simd_raytracer_tpu.parallel.sharding import (make_mesh,
                                                      train_step_sharded)

    scene = parse_scene_file(
        "/root/reference/scenes/hw15/scene2.crtscene").replace(
        height=32, width=32)
    params, skeleton = split_params(scene)
    leaf_bytes = {k: int(v.size * v.dtype.itemsize)
                  for k, v in params.items()}
    total = sum(leaf_bytes.values())

    nd = len(jax.devices())
    mesh = make_mesh(nd)
    n = 128
    ids = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (nd, 1))
    target = jnp.zeros((nd, n, 3), jnp.float32)
    seeds = jnp.tile(jnp.arange(1, dtype=jnp.uint32)[None], (nd, 1))
    # depth 2 keeps the trace quick; the all-reduce COUNT (one per param
    # leaf) is depth-independent — it comes from the pmean over the tree.
    cfg = RenderConfig(samples_per_pixel=1, chunk_size=n, max_ray_depth=2)

    lowered = train_step_sharded.lower(params, skeleton, cfg, mesh, ids,
                                       target, seeds)
    hlo = lowered.as_text()
    n_allreduce = hlo.count("all_reduce")

    # ring all-reduce moves 2*(nd-1)/nd * bytes per chip; v5e ICI
    # ~100 GB/s per direction per link
    ici_gbps = 100e9
    xfer_s = 2 * (nd - 1) / nd * total / ici_gbps

    print(json.dumps({
        "param_leaves": len(leaf_bytes),
        "grad_bytes_total": total,
        "grad_bytes_per_leaf": leaf_bytes,
        "hlo_all_reduce_ops": n_allreduce,
        "est_allreduce_seconds_8dev": round(xfer_s, 9),
        "r3_fwd_bwd_step_seconds": 0.043,   # 16384 rays / 381.9k rays/s
        "allreduce_fraction_of_step": round(xfer_s / 0.043, 9),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
