"""Select-backend isolation bench: pairs/s + MXU MFU (VERDICT r1 item 4).

Times each closest-hit select backend alone on dragon-scale work
(R rays x T=dragon triangles), in its own subprocess (tunnel quirk).
For the MXU path, reports MFU = matmul FLOPs / 197 TFLOP/s (v5e bf16
peak) and the effective pairs/s to compare against the VPU backends —
the data for the keep/retire decision on intersect_mxu.py.

Usage: python scripts/mxu_mfu.py [--one BACKEND]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BACKENDS = ["jnp", "fast", "mxu", "pallas", "sweep"]
R = 131072
PEAK_BF16 = 197e12   # TPU v5e per-chip peak (bf16 MXU)
PEAK_F32 = PEAK_BF16 / 4


def run_one(backend: str) -> int:
    import jax
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    from simd_raytracer_tpu import parse_scene_file
    from simd_raytracer_tpu.models.scene import derive_geometry
    from simd_raytracer_tpu.models.camera import primary_rays
    from simd_raytracer_tpu.ops.intersect import make_select_fn

    scene = parse_scene_file("/root/reference/scenes/hw09/scene5.crtscene")
    geom = derive_geometry(scene)
    t_count = int(geom.v0.shape[0])

    accel = None
    if backend == "sweep":
        from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
        accel = build_sweep_for_scene(scene)
    select = make_select_fn(backend, accel)

    # real primary rays (coherent, like the frame's bounce 0)
    pix = jnp.arange(R, dtype=jnp.int32) % (scene.height * scene.width)
    px, py = pix % scene.width, pix // scene.width
    half = jnp.full((R,), 0.5, jnp.float32)
    o, d = primary_rays(scene, 90.0, px, py, half, half)

    @jax.jit
    def run(o, d):
        idx, hit = select(o, d, geom.v0, geom.e1, geom.e2, 1e-6, True,
                          geom.tri_valid)
        return jnp.sum(idx) + jnp.sum(hit)

    float(run(o, d))                      # compile + warmup
    n_rep = 16
    t0 = time.perf_counter()
    outs = [run(o, d) for _ in range(n_rep)]
    _ = [float(x) for x in outs]
    dt = (time.perf_counter() - t0) / n_rep

    pairs = R * t_count
    matmul_flops = 2 * R * 10 * 4 * t_count       # (R,10)@(10,4T)
    out = {
        "backend": backend, "seconds": round(dt, 5),
        "pairs_per_sec": round(pairs / dt / 1e9, 2),   # G pairs/s
        "rays": R, "tris": t_count,
    }
    if backend == "mxu":
        out["matmul_tflops"] = round(matmul_flops / dt / 1e12, 2)
        out["mfu_bf16_peak"] = round(matmul_flops / dt / PEAK_BF16, 4)
        out["mfu_f32_peak"] = round(matmul_flops / dt / PEAK_F32, 4)
    print(json.dumps(out))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    args = ap.parse_args()
    if args.one:
        return run_one(args.one)
    for b in BACKENDS:
        r = subprocess.run([sys.executable, __file__, "--one", b],
                           capture_output=True, text=True, timeout=1200)
        out = r.stdout.strip().splitlines()
        print(out[-1] if out else f"FAILED {b}: {r.stderr.strip()[-200:]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
