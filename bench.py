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
    ap.add_argument("--_phase", default=None, choices=["forward", "backward"],
                    help=argparse.SUPPRESS)   # internal: single-phase run
    args = ap.parse_args()

    # The tunneled TPU backend errors when a previously-run executable is
    # re-executed after a different executable has run (InvalidArgument),
    # so the forward and backward phases each get a fresh process.
    if args.backward and args._phase is None:
        import subprocess
        base = [sys.executable, __file__,
                "--scene", args.scene, "--spp", str(args.spp),
                "--scale", str(args.scale), "--chunk", str(args.chunk),
                "--repeats", str(args.repeats),
                "--intersector", args.intersector,
                "--bounce-mode", args.bounce_mode]
        fwd = subprocess.run(base + ["--_phase", "forward"],
                             capture_output=True, text=True)
        bwd = subprocess.run(base + ["--_phase", "backward"],
                             capture_output=True, text=True)
        if fwd.returncode != 0:
            sys.stderr.write(fwd.stderr)
            return 1
        result = json.loads(fwd.stdout.strip().splitlines()[-1])
        if bwd.returncode == 0 and bwd.stdout.strip():
            result["detail"].update(
                json.loads(bwd.stdout.strip().splitlines()[-1]))
        else:
            sys.stderr.write(bwd.stderr)
        print(json.dumps(result))
        return 0

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

    # Backward metric FIRST: executing grad programs after a frame
    # render trips a tunnel-backend InvalidArgument on repeat
    # executions (fresh-process grads repeat fine), so measure the
    # fwd+bwd step before any forward frame runs.
    bwd_metrics = {}
    if args.backward and args._phase == "backward":
        import jax.numpy as jnp
        from simd_raytracer_tpu.ops.grad import loss_and_grad, split_params

        params, skeleton = split_params(scene)
        n = min(h * w, args.chunk)
        # interior rays: the top image rows are often pure background
        # (zero loss => zero cotangents); center rays exercise the real
        # backward path
        total = h * w * args.spp
        ids = jnp.arange(n, dtype=jnp.int32) + (total - n) // 2
        target = jnp.zeros((n, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        loss0, _ = loss_and_grad(params, skeleton, cfg, ids, target, key,
                                 accel)
        float(loss0)   # forced warmup (see force() note above)
        # Sequential forced steps: pipelining grad steps behind a frame
        # render trips a tunnel-backend InvalidArgument, so this number
        # includes one host round trip per step (slightly understated).
        n_steps = 8
        t0 = time.perf_counter()
        for i in range(n_steps):
            loss_i, _ = loss_and_grad(params, skeleton, cfg, ids, target,
                                      jax.random.PRNGKey(i), accel)
            assert np.isfinite(float(loss_i))
        per_step = (time.perf_counter() - t0) / n_steps
        bwd_metrics = {"fwd_bwd_rays_per_sec": round(n / per_step, 1),
                       "fwd_bwd_rays": n}
        print(json.dumps(bwd_metrics))
        return 0

    rays = h * w * args.spp

    import jax.numpy as jnp

    def force(x):
        # On tunneled TPUs jax.block_until_ready can return before the
        # computation finishes (measured: a 1.5 s frame "completes" in
        # 4 ms).  The only reliable fence is a host readback, so every
        # timing here reduces the output to a scalar on device and
        # transfers 4 bytes.
        return float(jnp.sum(x))

    # warmup (compile)
    force(render_frame(scene, cfg, accel=accel))

    # Single-frame latency (dispatch -> forced completion).
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        force(render_frame(scene, cfg, accel=accel))
        times.append(time.perf_counter() - t0)
    latency = min(times)

    # Steady-state throughput: dispatch frames back to back (independent
    # keys), then force each scalar — in-flight frames overlap the host
    # round trips, like a production render/serving loop.
    n_pipe = max(4, min(32, int(2.0 / max(latency, 1e-3))))
    keys = [jax.random.PRNGKey(1000 + i) for i in range(n_pipe)]
    t0 = time.perf_counter()
    sums = [jnp.sum(render_frame(scene, cfg, key=k, accel=accel))
            for k in keys]
    vals = [float(s) for s in sums]
    per_frame = (time.perf_counter() - t0) / n_pipe
    assert all(np.isfinite(v) for v in vals)
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
    result["detail"].update(bwd_metrics)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
