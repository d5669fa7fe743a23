"""Sweep-backend tuning scan on the real TPU: slice_size x r_tile.

One subprocess per point (tunnel quirk: one heavy program per process).
Usage: python scripts/tune_sweep.py [--one KEY]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key: (scene, scale, spp, depth, slice_size, r_tile)
CONFIGS = {
    "dragon_s256_r512": ("hw09/scene5", 1.0, 1, 5, 256, 512),
    "dragon_s128_r512": ("hw09/scene5", 1.0, 1, 5, 128, 512),
    "dragon_s256_r1024": ("hw09/scene5", 1.0, 1, 5, 256, 1024),
    "dragon_s128_r1024": ("hw09/scene5", 1.0, 1, 5, 128, 1024),
    "dragon_s256_r256": ("hw09/scene5", 1.0, 1, 5, 256, 256),
    "dragon_d0_s256_r512": ("hw09/scene5", 1.0, 1, 0, 256, 512),
    "dragon_d0_s128_r512": ("hw09/scene5", 1.0, 1, 0, 128, 512),
    "hw15_s256_r512": ("hw15/scene2", 0.5, 4, 5, 256, 512),
    "hw15_s128_r512": ("hw15/scene2", 0.5, 4, 5, 128, 512),
    # r5 scan: smaller slices/tiles after the front-to-back schedule
    # rework (tighter AABBs cull more; schedule makes culled slices free)
    "dragon_s128_r256": ("hw09/scene5", 1.0, 1, 5, 128, 256),
    "dragon_s64_r512": ("hw09/scene5", 1.0, 1, 5, 64, 512),
    "dragon_s64_r256": ("hw09/scene5", 1.0, 1, 5, 64, 256),
    "hw15_s128_r256": ("hw15/scene2", 0.5, 4, 5, 128, 256),
    "hw15_s64_r512": ("hw15/scene2", 0.5, 4, 5, 64, 512),
}


def run_one(key: str) -> int:
    scene_rel, scale, spp, depth, slice_size, r_tile = CONFIGS[key]
    import jax
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    from simd_raytracer_tpu import (RenderConfig, parse_scene_file,
                                    render_frame)
    from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene

    scene = parse_scene_file(f"/root/reference/scenes/{scene_rel}.crtscene")
    h = max(8, int(scene.height * scale))
    w = max(8, int(scene.width * scale))
    scene = scene.replace(height=h, width=w)
    cfg = RenderConfig(samples_per_pixel=spp, max_ray_depth=depth,
                       intersector="sweep", bounce_mode="roulette")
    accel = build_sweep_for_scene(scene, slice_size=slice_size,
                                  r_tile=r_tile)

    t0 = time.perf_counter()
    float(jnp.sum(render_frame(scene, cfg, accel=accel)))
    compile_s = time.perf_counter() - t0
    n_pipe = 4
    keys = [jax.random.PRNGKey(100 + i) for i in range(n_pipe)]
    t0 = time.perf_counter()
    sums = [jnp.sum(render_frame(scene, cfg, key=k, accel=accel))
            for k in keys]
    _ = [float(s) for s in sums]
    per_frame = (time.perf_counter() - t0) / n_pipe
    rays = h * w * spp
    print(json.dumps({
        "key": key, "seconds_per_frame": round(per_frame, 4),
        "rays_per_sec": round(rays / per_frame, 1),
        "slices": accel.num_slices, "compile_s": round(compile_s, 1),
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()
    if args.one:
        return run_one(args.one)
    keys = args.keys.split(",") if args.keys else list(CONFIGS)
    for key in keys:
        r = subprocess.run([sys.executable, __file__, "--one", key],
                           capture_output=True, text=True, timeout=1800)
        out = r.stdout.strip().splitlines()
        line = out[-1] if out else f"FAILED {key}: {r.stderr.strip()[-300:]}"
        print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
