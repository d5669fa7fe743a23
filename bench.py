"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: primary rays/sec/chip on scenes/hw15/scene2.crtscene (the
BASELINE.md target scene), default shading config (max_depth=5).  The
reference anchor is ~21M primary rays/s derived from its "<100 ms at
1920x1080" dragon figure on an AVX2 laptop (BASELINE.md); vs_baseline is
ours / 21e6.

Usage: python bench.py [--spp N] [--scale F] [--scene PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/scenes/hw15/scene2.crtscene")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--scale", type=float, default=0.5,
                    help="resolution scale on the scene's native HxW")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--repeats", type=int, default=3)
    # "fast" = bilinear triple-product select; XLA lifts its outer-product
    # sums onto the MXU (~40x the fused-VPU path), winners identical to
    # "jnp" except last-ulp ties at shared triangle edges.
    ap.add_argument("--intersector", default="fast",
                    choices=["jnp", "fast", "pallas", "mxu", "kdtree", "sweep"])
    # roulette is the production default: unbiased (identical in
    # expectation to the reference's full recursion split, bitwise equal
    # on non-branching scenes) with a flat wavefront.
    ap.add_argument("--bounce-mode", default="roulette",
                    choices=["split", "roulette"])
    ap.add_argument("--no-backward", dest="backward", action="store_false",
                    help="skip the fwd+bwd gradient throughput timing")
    ap.set_defaults(backward=True)
    args = ap.parse_args()

    from simd_raytracer_tpu import RenderConfig, parse_scene_file, render_frame

    scene = parse_scene_file(args.scene)
    h = max(8, int(scene.height * args.scale))
    w = max(8, int(scene.width * args.scale))
    scene = scene.replace(height=h, width=w)
    cfg = RenderConfig(samples_per_pixel=args.spp, chunk_size=args.chunk,
                       intersector=args.intersector,
                       bounce_mode=args.bounce_mode)

    accel = None
    if args.intersector == "kdtree":
        from simd_raytracer_tpu.accel.build import build_kdtree_for_scene
        accel = build_kdtree_for_scene(scene)
    elif args.intersector == "sweep":
        from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
        accel = build_sweep_for_scene(scene)

    rays = h * w * args.spp

    # warmup (compile)
    img = render_frame(scene, cfg, accel=accel)
    jax.block_until_ready(img)

    # Single-frame latency (includes one host<->device round trip — on
    # tunneled TPUs that alone is ~20 ms).
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        img = render_frame(scene, cfg, accel=accel)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    latency = min(times)

    # Steady-state throughput: pipeline frames back to back (independent
    # keys), sync once.  This is what a production render/serving loop
    # sees; the host link latency amortizes away.
    n_pipe = max(4, int(0.5 / max(latency, 1e-3)))
    keys = [jax.random.PRNGKey(1000 + i) for i in range(n_pipe)]
    t0 = time.perf_counter()
    imgs = [render_frame(scene, cfg, key=k, accel=accel) for k in keys]
    jax.block_until_ready(imgs)
    per_frame = (time.perf_counter() - t0) / n_pipe
    rays_per_sec = rays / per_frame

    baseline = 21e6  # BASELINE.md derived reference anchor
    result = {
        "metric": "primary_rays_per_sec_hw15s2",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
        "detail": {
            "scene": args.scene, "h": h, "w": w, "spp": args.spp,
            "intersector": args.intersector,
            "bounce_mode": args.bounce_mode,
            "seconds_per_frame": round(per_frame, 4),
            "single_frame_latency": round(latency, 4),
            "pipelined_frames": n_pipe,
            "device": str(jax.devices()[0]),
        },
    }

    if args.backward:
        import jax.numpy as jnp
        from simd_raytracer_tpu.ops.grad import loss_and_grad, split_params

        params, skeleton = split_params(scene)
        n = min(h * w, args.chunk)
        ids = jnp.arange(n, dtype=jnp.int32)
        target = jnp.zeros((n, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        out = loss_and_grad(params, skeleton, cfg, ids, target, key, accel)
        jax.block_until_ready(out)
        n_pipe = 16        # pipelined: hide the host-link sync latency
        t0 = time.perf_counter()
        outs = [loss_and_grad(params, skeleton, cfg, ids, target,
                              jax.random.PRNGKey(i), accel)
                for i in range(n_pipe)]
        jax.block_until_ready(outs)
        per_step = (time.perf_counter() - t0) / n_pipe
        result["detail"]["fwd_bwd_rays_per_sec"] = round(n / per_step, 1)
        result["detail"]["fwd_bwd_rays"] = n

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
