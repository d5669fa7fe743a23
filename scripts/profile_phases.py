"""Phase profiling on the real TPU: one config per subprocess.

Decomposes frame cost by sweeping max_ray_depth / intersector /
occlusion so the gap to the reference anchor can be attributed to
bounce-0 trace vs shadow occlusion vs secondary bounces.  Respects the
tunnel quirks (CLAUDE.md): forced scalar readbacks for timing, one
compiled program per process.

`no_occl` configs monkeypatch ops.shade.occluded to an all-lit constant
(profiling only — isolates the shadow-query cost, since zeroing light
intensities does NOT skip the occlusion trace).

Usage: python scripts/profile_phases.py            # run the suite
       python scripts/profile_phases.py --one KEY  # internal: one config
       python scripts/profile_phases.py --keys a,b # subset
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = dict(scene="hw09/scene5", scale=1.0, spp=1, depth=5,
            intersector="sweep", mode="roulette", occlusion="fast",
            no_occl=False, chunk=16384)

CONFIGS = {
    # dragon decomposition (the README.md:53-58 "<100 ms" config)
    "dragon_d5_sweep": dict(BASE),
    "dragon_d0_sweep": dict(BASE, depth=0),
    "dragon_d1_sweep": dict(BASE, depth=1),
    "dragon_d5_sweep_nooccl": dict(BASE, no_occl=True),
    "dragon_d0_sweep_c65536": dict(BASE, depth=0, chunk=65536),
    "dragon_d5_sweep_c65536": dict(BASE, chunk=65536),
    "dragon_d5_sweep_c131072": dict(BASE, chunk=131072),
    "dragon_d5_fast": dict(BASE, intersector="fast"),
    "dragon_d5_fast_nooccl": dict(BASE, intersector="fast", no_occl=True),
    "dragon_d0_fast": dict(BASE, intersector="fast", depth=0),
    "dragon_d5_jnp": dict(BASE, intersector="jnp"),
    # headline scene decomposition (hw15/scene2 at bench config)
    "hw15_d5_fast": dict(BASE, scene="hw15/scene2", scale=0.5, spp=4,
                         intersector="fast"),
    "hw15_d5_sweep": dict(BASE, scene="hw15/scene2", scale=0.5, spp=4),
    "hw15_d0_fast": dict(BASE, scene="hw15/scene2", scale=0.5, spp=4,
                         intersector="fast", depth=0),
    "hw15_d5_fast_nooccl": dict(BASE, scene="hw15/scene2", scale=0.5,
                                spp=4, intersector="fast", no_occl=True),
    # refexact decomposition: split tree vs march occlusion, separately
    "hw15_d5_split": dict(BASE, scene="hw15/scene2", scale=0.5, spp=4,
                          intersector="fast", mode="split"),
    "hw15_d5_march": dict(BASE, scene="hw15/scene2", scale=0.5, spp=4,
                          intersector="fast", occlusion="march"),
    "hw15_d5_splitmarch": dict(BASE, scene="hw15/scene2", scale=0.5,
                               spp=4, intersector="fast", mode="split",
                               occlusion="march"),
    # r5: the march probe (any-hit solid/glass pre-pass) makes sweep a
    # refexact candidate too, and march ~ fast on glassless scenes.
    "hw15_d5_splitmarch_sweep": dict(BASE, scene="hw15/scene2",
                                     scale=0.5, spp=4, mode="split",
                                     occlusion="march"),
    "hw15_d5_march_sweep": dict(BASE, scene="hw15/scene2", scale=0.5,
                                spp=4, occlusion="march"),
    "dragon_d5_march_sweep": dict(BASE, occlusion="march"),
}


def run_one(key: str) -> int:
    c = CONFIGS[key]
    import jax
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    from simd_raytracer_tpu import (RenderConfig, parse_scene_file,
                                    render_frame)

    scene = parse_scene_file(
        f"/root/reference/scenes/{c['scene']}.crtscene")
    h = max(8, int(scene.height * c["scale"]))
    w = max(8, int(scene.width * c["scale"]))
    scene = scene.replace(height=h, width=w)
    if c["no_occl"]:
        from simd_raytracer_tpu.ops import shade as shade_mod

        def never_occluded(o, d, max_t, *a, **k):
            return jnp.zeros(o.shape[0], bool)

        shade_mod.occluded = never_occluded
    cfg = RenderConfig(samples_per_pixel=c["spp"],
                       max_ray_depth=c["depth"],
                       intersector=c["intersector"],
                       bounce_mode=c["mode"],
                       occlusion_mode=c["occlusion"],
                       chunk_size=c["chunk"])
    accel = None
    if c["intersector"] == "sweep":
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
    rays = h * w * c["spp"]
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
