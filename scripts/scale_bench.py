"""Large-scene scaling bench: synthetic terrain at 65k / 250k triangles.

The reference corpus tops out at ~4k triangles (SURVEY.md §6); the sweep
backend exists for the regime where brute force stops being viable, so
this script measures it there: a heightfield terrain (2*G^2 triangles),
512x512 primary+shadow render, jnp brute force vs the block-sparse sweep.
One (config, backend) per subprocess (tunnel quirk: one heavy program
per process).  Rows go to BENCH.md.

Usage: python scripts/scale_bench.py            # the suite
       python scripts/scale_bench.py --one KEY  # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key: (grid G -> 2*G^2 tris, intersector, depth)
CONFIGS = {
    "terrain65k_jnp": (181, "jnp", 1),
    "terrain65k_sweep": (181, "sweep", 1),
    "terrain250k_jnp": (354, "jnp", 1),
    "terrain250k_sweep": (354, "sweep", 1),
}


def make_terrain_scene(g: int, height=512, width=512):
    """Heightfield over [-10,10]^2 with rolling sine hills, one light,
    diffuse material, camera looking down the -z axis from above."""
    import numpy as np
    from simd_raytracer_tpu.models.scene import build_scene

    xs = np.linspace(-10, 10, g + 1, dtype=np.float32)
    zs = np.linspace(-20, 0, g + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="xy")
    gy = (np.sin(gx * 0.9) * np.cos(gz * 0.7) * 0.8
          + np.sin(gx * 2.3 + gz * 1.7) * 0.3 - 2.0).astype(np.float32)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    ii, jj = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    v00 = (ii * (g + 1) + jj).ravel()
    v01 = v00 + 1
    v10 = v00 + (g + 1)
    v11 = v10 + 1
    tris = np.concatenate([
        np.stack([v00, v10, v01], axis=1),
        np.stack([v01, v10, v11], axis=1),
    ]).astype(np.int64)

    return build_scene(
        mesh_vertices=[verts], mesh_tri_vidx=[tris], mesh_uvs=[None],
        mesh_material=[0],
        materials=[{"tag": 0, "albedo": (0.55, 0.5, 0.4), "smooth": True}],
        textures=[], lights=[((0.0, 6.0, -10.0), 900.0)],
        cam_pos=(0.0, 2.5, 1.0),
        cam_mat=[[1.0, 0.0, 0.0],
                 [0.0, 0.9363, -0.3515],     # tilt ~20.6 deg down
                 [0.0, 0.3515, 0.9363]],
        background=(0.2, 0.3, 0.5), height=height, width=width,
        bucket_size=64,
    )


def run_one(key: str) -> int:
    g, intersector, depth = CONFIGS[key]
    import jax
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax.numpy as jnp
    from simd_raytracer_tpu import RenderConfig, render_frame

    scene = make_terrain_scene(g)
    cfg = RenderConfig(samples_per_pixel=1, max_ray_depth=depth,
                       intersector=intersector, bounce_mode="roulette",
                       chunk_size=16384)
    accel = None
    build_s = 0.0
    if intersector == "sweep":
        from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
        t0 = time.perf_counter()
        accel = build_sweep_for_scene(scene)
        build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(jnp.sum(render_frame(scene, cfg, accel=accel)))
    compile_s = time.perf_counter() - t0
    n_pipe = 4
    keys = [jax.random.PRNGKey(100 + i) for i in range(n_pipe)]
    t0 = time.perf_counter()
    sums = [jnp.sum(render_frame(scene, cfg, key=k, accel=accel))
            for k in keys]
    import numpy as np
    assert np.isfinite(np.asarray(jnp.stack(sums))).all()
    per_frame = (time.perf_counter() - t0) / n_pipe
    rays = scene.height * scene.width
    print(json.dumps({
        "key": key, "tris": int(2 * g * g),
        "seconds_per_frame": round(per_frame, 4),
        "rays_per_sec": round(rays / per_frame, 1),
        "compile_s": round(compile_s, 1),
        "accel_build_s": round(build_s, 2),
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
