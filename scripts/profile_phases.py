"""Phase profiling on the real TPU: one config per subprocess.

Decomposes frame cost by sweeping max_ray_depth / intersector /
occlusion so the gap to the reference anchor can be attributed to
bounce-0 trace vs shadow occlusion vs secondary bounces.  Respects the
tunnel quirks (CLAUDE.md): forced scalar readbacks for timing, one
compiled program per process.

Usage: python scripts/profile_phases.py            # run the suite
       python scripts/profile_phases.py --one KEY  # internal: one config
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # key: (scene, scale, spp, depth, intersector, bounce_mode, no_lights)
    "dragon_d5_fast": ("hw09/scene5", 1.0, 1, 5, "fast", "roulette", False),
    "dragon_d0_fast": ("hw09/scene5", 1.0, 1, 0, "fast", "roulette", False),
    "dragon_d1_fast": ("hw09/scene5", 1.0, 1, 1, "fast", "roulette", False),
    "dragon_d1_nolight": ("hw09/scene5", 1.0, 1, 1, "fast", "roulette",
                          True),
    "dragon_d5_sweep": ("hw09/scene5", 1.0, 1, 5, "sweep", "roulette",
                        False),
    "dragon_d0_sweep": ("hw09/scene5", 1.0, 1, 0, "sweep", "roulette",
                        False),
    "hw15_d5_sweep": ("hw15/scene2", 0.5, 4, 5, "sweep", "roulette",
                      False),
    "dragon_d5_jnp": ("hw09/scene5", 1.0, 1, 5, "jnp", "roulette", False),
    "hw15_d5_fast": ("hw15/scene2", 0.5, 4, 5, "fast", "roulette", False),
    "hw15_d0_fast": ("hw15/scene2", 0.5, 4, 0, "fast", "roulette", False),
    "hw15_d1_fast": ("hw15/scene2", 0.5, 4, 1, "fast", "roulette", False),
    "hw15_d5_split": ("hw15/scene2", 0.5, 4, 5, "fast", "split", False),
}


def run_one(key: str) -> int:
    scene_rel, scale, spp, depth, intersector, mode, no_lights = CONFIGS[key]
    import jax
    import jax.numpy as jnp
    from simd_raytracer_tpu import (RenderConfig, parse_scene_file,
                                    render_frame)

    scene = parse_scene_file(f"/root/reference/scenes/{scene_rel}.crtscene")
    h = max(8, int(scene.height * scale))
    w = max(8, int(scene.width * scale))
    scene = scene.replace(height=h, width=w)
    if no_lights:
        scene = scene.replace(
            light_intensity=jnp.zeros_like(scene.light_intensity))
    cfg = RenderConfig(samples_per_pixel=spp, max_ray_depth=depth,
                       intersector=intersector, bounce_mode=mode)
    accel = None
    if intersector == "sweep":
        from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
        accel = build_sweep_for_scene(scene)

    def force(x):
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    force(render_frame(scene, cfg, accel=accel))
    compile_s = time.perf_counter() - t0

    n_pipe = 8
    keys = [jax.random.PRNGKey(100 + i) for i in range(n_pipe)]
    t0 = time.perf_counter()
    sums = [jnp.sum(render_frame(scene, cfg, key=k, accel=accel))
            for k in keys]
    import numpy as np
    assert np.isfinite(np.asarray(jnp.stack(sums))).all()
    per_frame = (time.perf_counter() - t0) / n_pipe
    rays = h * w * spp
    print(json.dumps({
        "key": key, "seconds_per_frame": round(per_frame, 4),
        "rays_per_sec": round(rays / per_frame, 1),
        "compile_s": round(compile_s, 1), "h": h, "w": w,
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None)
    ap.add_argument("--keys", default=None,
                    help="comma-separated subset of configs")
    args = ap.parse_args()
    if args.one:
        return run_one(args.one)

    keys = args.keys.split(",") if args.keys else list(CONFIGS)
    for key in keys:
        r = subprocess.run([sys.executable, __file__, "--one", key],
                           capture_output=True, text=True, timeout=1800)
        out = r.stdout.strip().splitlines()
        line = out[-1] if out else f"FAILED: {r.stderr.strip()[-300:]}"
        print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
