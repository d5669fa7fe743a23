"""Flagship-scale showcase renders (VERDICT r1 item 7) -> outputs/.

Targets mirror the reference's published artifacts (README.md:46-65):
  gi128      hw15/scene2 1920x1920, 128 spp, depth 5, 1 GI ray
  gi128d10   hw15/scene2 1920x1920, 128 spp, depth 10, 1 GI ray
  gi512      hw15/scene2 1920x1920, 512 spp, depth 5, 1 GI ray
  dragon     hw09/scene5 1920x1080 spp1 (the "<100 ms" headline frame)
  refractive hw11/scene8 1920x1080 spp1, reference-exact split+march
  orbit      hw09/scene5 turntable -> animated GIF (no ffmpeg in image)

Each target runs in its own process (tunnel quirk #2).  Long GI renders
go through render_progressive with an npz checkpoint so a kill resumes.

Usage: python scripts/showcase.py [targets...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "outputs")
SCENES = "/root/reference/scenes"


def _save_png(img, path):
    import numpy as np
    from PIL import Image
    q = (np.clip(np.asarray(img), 0.0, 1.0) * 255.999).astype("uint8")
    Image.fromarray(q).save(path)


def run_gi(spp: int, depth: int = 5) -> None:
    import jax
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    from simd_raytracer_tpu import RenderConfig, parse_scene_file
    from simd_raytracer_tpu.utils.checkpoint import render_progressive

    from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene

    scene = parse_scene_file(f"{SCENES}/hw15/scene2.crtscene")
    # sweep overtook fast on this scene in r4/r5 (BENCH.md §3)
    cfg = RenderConfig(samples_per_pixel=spp, max_ray_depth=depth,
                       diffuse_reflection_ray_count=1,
                       intersector="sweep", bounce_mode="roulette")
    accel = build_sweep_for_scene(scene)
    ckpt = os.path.join(OUT, f"gi_{spp}spp_{depth}.ckpt.npz")
    legacy = os.path.join(OUT, f"gi_{spp}spp.ckpt.npz")   # pre-r4 name
    if depth == 5 and not os.path.exists(ckpt) and os.path.exists(legacy):
        ckpt = legacy   # resume an old in-progress render, don't restart
    t0 = time.time()
    img = render_progressive(
        scene, cfg, total_spp=spp, spp_per_batch=8,
        checkpoint_path=ckpt, accel=accel,
        on_batch=lambda done, _: print(f"  {done}/{spp} spp "
                                       f"({time.time()-t0:.0f}s)",
                                       flush=True))
    path = os.path.join(OUT, f"gi_{spp}spp_{depth}_1.png")
    _save_png(img, path)
    print(json.dumps({"target": f"gi{spp}_d{depth}", "path": path,
                      "seconds": round(time.time() - t0, 1),
                      "h": scene.height, "w": scene.width}))


def run_still(scene_rel: str, name: str, exact: bool) -> None:
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    from simd_raytracer_tpu import RenderConfig, parse_scene_file, \
        render_frame
    from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene

    scene = parse_scene_file(f"{SCENES}/{scene_rel}.crtscene")
    if exact:
        cfg = RenderConfig(bounce_mode="split", occlusion_mode="march")
        accel = None
    else:
        cfg = RenderConfig(intersector="sweep", bounce_mode="roulette")
        accel = build_sweep_for_scene(scene)
    t0 = time.time()
    img = render_frame(scene, cfg, accel=accel)
    path = os.path.join(OUT, f"{name}.png")
    _save_png(img, path)
    print(json.dumps({"target": name, "path": path,
                      "seconds": round(time.time() - t0, 1),
                      "h": scene.height, "w": scene.width}))


def run_orbit() -> None:
    import numpy as np
    from PIL import Image
    from simd_raytracer_tpu.utils.compile_cache import enable as _cc
    _cc()
    from simd_raytracer_tpu import RenderConfig, parse_scene_file
    from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
    from simd_raytracer_tpu.utils.animation import (orbit_path,
                                                    render_animation)

    scene = parse_scene_file(f"{SCENES}/hw09/scene5.crtscene")
    scene = scene.replace(height=540, width=960)
    cfg = RenderConfig(intersector="sweep", bounce_mode="roulette")
    accel = build_sweep_for_scene(scene)
    n_frames = 48
    t0 = time.time()
    frames = render_animation(orbit_path(scene, n_frames), cfg,
                              accel=accel)
    imgs = [Image.fromarray(
        (np.clip(f, 0, 1) * 255.999).astype("uint8")) for f in frames]
    path = os.path.join(OUT, "dragon_orbit.gif")
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=83, loop=0)
    print(json.dumps({"target": "orbit", "path": path,
                      "seconds": round(time.time() - t0, 1),
                      "frames": n_frames}))


TARGETS = {
    "gi128": lambda: run_gi(128),
    "gi128d10": lambda: run_gi(128, depth=10),
    "gi512": lambda: run_gi(512),
    "dragon": lambda: run_still("hw09/scene5", "dragon_1080p", False),
    "refractive": lambda: run_still("hw11/scene8", "refractive_dragon",
                                    True),
    "orbit": run_orbit,
}


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    args = sys.argv[1:]
    if args and args[0] == "--one":
        TARGETS[args[1]]()
        return 0
    names = args or list(TARGETS)
    for name in names:
        r = subprocess.run([sys.executable, __file__, "--one", name],
                           timeout=7200)
        if r.returncode != 0:
            print(f"FAILED {name}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
