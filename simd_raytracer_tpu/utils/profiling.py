"""Per-phase timing + throughput metrics.

The reference times exactly one thing: the whole frame, with
chrono::high_resolution_clock around render_still (reference:
src/main.cpp:16-21).  Per SURVEY.md §5 the TPU build reports per-phase
wall time (load / accel build / compile / render / grad), rays/s (the
BASELINE metric), and can wrap any phase in a jax.profiler trace for
XLA/Pallas kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Collects named wall-time phases; re-entering a name accumulates."""

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] = (self.seconds.get(name, 0.0)
                                  + time.perf_counter() - t0)

    def report(self) -> str:
        width = max((len(k) for k in self.seconds), default=0)
        return "\n".join(f"{k.ljust(width)}  {v:10.4f} s"
                         for k, v in self.seconds.items())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def wavefront_occupancy(scene, cfg, ray_ids, key=None, accel=None):
    """Per-bounce live-ray counts for one chunk (SURVEY.md §5 metrics:
    'per-bounce wavefront occupancy counters').

    Returns a list of ints: entry d is how many rays enter bounce d with
    nonzero throughput.  Diagnoses when roulette compaction
    (config.compact_factor) will engage and how much of the depth budget
    a scene actually uses.
    """
    import jax
    import jax.numpy as jnp

    from ..models.scene import derive_geometry
    from ..ops.intersect import trace
    from ..ops.shade import shade

    if key is None:
        key = jax.random.PRNGKey(cfg.rng_seed or 0)

    @jax.jit
    def counts(ray_ids, key):
        geom = derive_geometry(scene)
        from ..models.camera import primary_rays

        r0 = ray_ids.shape[0]
        spp = cfg.samples_per_pixel
        total = scene.height * scene.width * spp
        valid = ray_ids < total
        ids = jnp.minimum(ray_ids, total - 1)
        pix = ids // spp
        jx = jnp.full((r0,), 0.5, jnp.float32)
        o, d = primary_rays(scene, cfg.fov_degrees, pix % scene.width,
                            pix // scene.width, jx, jx)
        weight = valid.astype(jnp.float32)
        out = []
        for depth in range(cfg.max_ray_depth + 1):
            out.append(jnp.sum(weight > 0.0))
            if depth == cfg.max_ray_depth:
                break
            hit = trace(o, d, scene, geom, cfg.epsilon, cull=(depth == 0),
                        intersector=cfg.intersector, accel=accel)
            _, (o, d, weight, _) = shade(
                scene, geom, hit, d, weight, cfg,
                jax.random.fold_in(key, depth + 1), accel)
        return jnp.stack(out)

    return [int(c) for c in counts(ray_ids, key)]


def profile_render(scene_path: str, cfg=None, scale: float = 1.0,
                   repeats: int = 3, trace_dir: Optional[str] = None,
                   backward: bool = False) -> Dict[str, float]:
    """Phase-timed render of a scene file; returns a metrics dict.

    Phases: load, accel_build (kdtree intersector only), compile (first
    call), render (best of `repeats` steady-state frames).  Throughput is
    primary rays/s = H*W*spp / render_seconds; with backward=True a
    fwd+bwd loss_and_grad step is timed as grad_seconds /
    grad_rays_per_sec (the BASELINE.json north-star metric).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import RenderConfig
    from ..models.loader import parse_scene_file
    from ..ops.render import render_frame

    cfg = cfg or RenderConfig()
    timer = PhaseTimer()

    with timer.phase("load"):
        scene = parse_scene_file(scene_path)
        if scale != 1.0:
            scene = scene.replace(height=max(8, int(scene.height * scale)),
                                  width=max(8, int(scene.width * scale)))

    accel = None
    if cfg.intersector in ("kdtree", "sweep"):
        with timer.phase("accel_build"):
            if cfg.intersector == "kdtree":
                from ..accel.build import build_kdtree_for_scene
                accel = build_kdtree_for_scene(scene)
            else:
                from ..accel.sweep import build_sweep_for_scene
                accel = build_sweep_for_scene(scene)

    with timer.phase("compile"):
        img = render_frame(scene, cfg, accel=accel)
        jax.block_until_ready(img)

    with device_trace(trace_dir):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            img = render_frame(scene, cfg, accel=accel)
            jax.block_until_ready(img)
            best = min(best, time.perf_counter() - t0)
    timer.seconds["render"] = best

    rays = scene.height * scene.width * cfg.samples_per_pixel
    metrics = dict(timer.seconds)
    metrics["rays_per_sec"] = rays / best
    metrics["height"] = scene.height
    metrics["width"] = scene.width
    metrics["spp"] = cfg.samples_per_pixel

    if backward:
        from ..ops.grad import loss_and_grad, split_params

        params, skeleton = split_params(scene)
        n = min(scene.height * scene.width, cfg.chunk_size)
        ids = jnp.arange(n, dtype=jnp.int32)
        target = jnp.zeros((n, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        with timer.phase("grad_compile"):
            out = loss_and_grad(params, skeleton, cfg, ids, target, key,
                                accel)
            jax.block_until_ready(out)
        best_g = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = loss_and_grad(params, skeleton, cfg, ids, target, key,
                                accel)
            jax.block_until_ready(out)
            best_g = min(best_g, time.perf_counter() - t0)
        metrics["grad_seconds"] = best_g
        metrics["grad_rays_per_sec"] = n / best_g
        metrics["grad_compile"] = timer.seconds["grad_compile"]

    return metrics
