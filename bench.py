"""Benchmark driver: prints the headline metric as ONE JSON line.

Headline metric: primary rays/sec/chip on scenes/hw15/scene2.crtscene
(the BASELINE.md target scene) at the default shading config.  The
reference anchor is ~21M primary rays/s derived from its "<100 ms at
1920x1080" dragon figure on an AVX2 laptop (BASELINE.md); vs_baseline is
ours / 21e6.

The default run measures four phases, EACH IN ITS OWN SUBPROCESS (the
tunneled TPU backend errors when an executable re-executes after a
different executable ran in the same process — CLAUDE.md quirk #2):

  headline   hw15/scene2 960x960 spp4, roulette + sweep select
  dragon     hw09/scene5 at native 1920x1080 spp1 (the README.md:53-58
             "<100 ms" headline config), sweep intersector
  refexact   the headline frame with reference-exact semantics
             (bounce_mode=split, occlusion=march) — the estimator the
             C++ reference actually runs (render.hpp:278-301, :110-131)
  backward   fwd+bwd gradient step throughput (inverse rendering)
  northstar  (only if budget remains) 128-spp GI fwd+bwd + FD check

Robustness against the driver's clock (the round-4 failure mode was a
parent-level timeout that erased every completed phase):

  * a persistent XLA compilation cache lives in .jax_cache/ next to this
    file, so any config that has EVER compiled on this machine skips its
    multi-minute fresh compile (CLAUDE.md quirk #4/#7);
  * the headline phase runs FIRST and its metric line is printed (and
    snapshotted to BENCH_partial.json) the moment it exists — later
    phases only ever append detail by reprinting the line;
  * a global wall-clock budget (BENCH_BUDGET_S, default 1500 s) gates
    every phase launch; a phase that overruns the remaining budget is
    ABANDONED, not killed (killing a TPU client mid-compile wedges the
    tunnel for 10-30 min, quirk #7), and no further phase launches;
  * SIGTERM/SIGINT print the current result line before exiting, so
    even a signalled run leaves a parseable stdout.

Timings force completion with a scalar readback (quirk #1: on this
tunnel, block_until_ready can return early).

Usage: python bench.py [--spp N] [--scale F] [--scene PATH] [--quick]
       python bench.py --mesh 8        # sharded scaling harness (CPU ok)
       python bench.py --northstar     # 128-spp GI fwd+bwd + FD check
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

BASELINE = 21e6  # BASELINE.md derived reference anchor (primary rays/s)

_HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(_HERE, ".jax_cache")
PARTIAL_PATH = os.path.join(_HERE, "BENCH_partial.json")

# Exported before any child (or this process's own sitecustomize-started
# jax) compiles: every phase subprocess inherits the persistent cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")


def _force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def _render_throughput(scene, cfg, accel=None, repeats=3, min_pipe=4):
    """(seconds_per_frame, single_frame_latency) with forced readbacks."""
    import jax
    import jax.numpy as jnp
    from simd_raytracer_tpu import render_frame

    _force(render_frame(scene, cfg, accel=accel))          # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(render_frame(scene, cfg, accel=accel))
        times.append(time.perf_counter() - t0)
    latency = min(times)
    n_pipe = max(min_pipe, min(32, int(2.0 / max(latency, 1e-3))))
    keys = [jax.random.PRNGKey(1000 + i) for i in range(n_pipe)]
    t0 = time.perf_counter()
    sums = [jnp.sum(render_frame(scene, cfg, key=k, accel=accel))
            for k in keys]
    # ONE stacked readback forces every frame (the stack depends on all
    # of them) without paying the ~25 ms tunnel round trip per frame
    # that per-scalar float() readbacks were measured to cost.
    import numpy as np
    vals = np.asarray(jnp.stack(sums))
    assert np.isfinite(vals).all(), "NaN frame sum"
    per_frame = (time.perf_counter() - t0) / n_pipe
    # Pipelining overlaps dispatch with execution, so per-frame time can
    # only legitimately be <= the forced single-frame latency.  The
    # tunnel occasionally stalls the no-readback pipelined batch ~20x
    # (observed r5: latency 0.586 s but 13.6 s/frame pipelined, same
    # warm executable, adjacent phases normal) — when that happens the
    # forced per-frame latency is the honest throughput number.
    if per_frame > latency:
        sys.stderr.write(f"[pipelined path stalled: {per_frame:.3f}s "
                         f"vs latency {latency:.3f}s — using latency]\n")
        per_frame = latency
    return per_frame, latency


def _load(scene_path, scale):
    from simd_raytracer_tpu import parse_scene_file
    scene = parse_scene_file(scene_path)
    h = max(8, int(scene.height * scale))
    w = max(8, int(scene.width * scale))
    return scene.replace(height=h, width=w)


def _build_accel(scene, intersector):
    if intersector == "kdtree":
        from simd_raytracer_tpu.accel.build import build_kdtree_for_scene
        return build_kdtree_for_scene(scene)
    if intersector == "sweep":
        from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
        return build_sweep_for_scene(scene)
    return None


# --------------------------------------------------------------- phases

def phase_forward(args, cfg_overrides=None, scene_path=None, scale=None,
                  spp=None):
    from simd_raytracer_tpu import RenderConfig

    scene = _load(scene_path or args.scene, args.scale if scale is None
                  else scale)
    spp = args.spp if spp is None else spp
    kw = dict(samples_per_pixel=spp, chunk_size=args.chunk,
              intersector=args.intersector, bounce_mode=args.bounce_mode)
    kw.update(cfg_overrides or {})
    cfg = RenderConfig(**kw)
    accel = _build_accel(scene, cfg.intersector)
    per_frame, latency = _render_throughput(scene, cfg, accel,
                                            repeats=args.repeats)
    rays = scene.height * scene.width * spp
    return {"rays_per_sec": round(rays / per_frame, 1),
            "seconds_per_frame": round(per_frame, 4),
            "single_frame_latency": round(latency, 4),
            "h": scene.height, "w": scene.width, "spp": spp,
            "intersector": cfg.intersector,
            "bounce_mode": cfg.bounce_mode}


def phase_refexact(args):
    out = phase_forward(args, cfg_overrides=dict(
        bounce_mode="split", occlusion_mode="march", intersector="fast"))
    return {"refexact_" + k: v for k, v in out.items()}


def phase_dragon(args):
    out = phase_forward(
        args, cfg_overrides=dict(intersector="sweep"),
        scene_path="/root/reference/scenes/hw09/scene5.crtscene",
        scale=1.0, spp=1)
    o = {"dragon_" + k: v for k, v in out.items()}
    o["dragon_vs_anchor"] = round(out["rays_per_sec"] / BASELINE, 3)
    return o


def phase_backward(args, spp=None, gi=0, fd_check=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simd_raytracer_tpu import RenderConfig
    from simd_raytracer_tpu.ops.grad import (loss_and_grad, split_params,
                                             train_steps)

    scene = _load(args.scene, args.scale)
    spp = args.spp if spp is None else spp
    cfg = RenderConfig(samples_per_pixel=spp, chunk_size=args.chunk,
                       intersector=args.intersector,
                       bounce_mode=args.bounce_mode,
                       diffuse_reflection_ray_count=gi)
    accel = _build_accel(scene, cfg.intersector)
    params, skeleton = split_params(scene)
    h, w = scene.height, scene.width
    n = min(h * w * spp, args.chunk)
    total = h * w * spp
    # interior rays: center rays exercise the real backward path
    ids = jnp.arange(n, dtype=jnp.int32) + (total - n) // 2
    target = jnp.zeros((n, 3), jnp.float32)
    pref = "northstar_" if gi else "fwd_bwd_"
    out = {}
    if fd_check:
        # FD-allclose on a scalar param (fixed key -> deterministic
        # estimator): d(loss)/d(intensity) vs central difference.  Runs
        # BEFORE the scan executable — loss_and_grad is a different
        # executable and the tunnel backend errors when one re-executes
        # after another ran (CLAUDE.md quirk #2).
        loss0, g0 = loss_and_grad(params, skeleton, cfg, ids, target,
                                  jax.random.PRNGKey(0), accel)
        float(loss0)

        def loss_at(di):
            p = dict(params)
            p["light_intensity"] = params["light_intensity"] + di
            l, _ = loss_and_grad(p, skeleton, cfg, ids, target,
                                 jax.random.PRNGKey(0), accel)
            return float(l)

        eps_fd = 0.05 * float(jnp.max(jnp.abs(
            params["light_intensity"]))) or 1.0
        fd = (loss_at(eps_fd) - loss_at(-eps_fd)) / (2 * eps_fd)
        an = float(jnp.sum(g0["light_intensity"]))
        rel = abs(fd - an) / max(abs(fd), abs(an), 1e-12)
        out[pref + "fd_rel_err"] = round(rel, 4)
        assert rel < 0.05, f"FD mismatch: analytic {an} vs FD {fd}"

    # Throughput: n_steps SGD steps per executable call (lax.scan with
    # donated params — one dispatch + one readback for the whole batch).
    # Params are re-materialized as fresh buffers first; split_params
    # aliases the skeleton's arrays and an aliased donation is refused.
    n_steps = 8
    p = jax.tree_util.tree_map(jnp.array, params)
    p, losses = train_steps(p, skeleton, cfg, ids, target,
                            jax.random.PRNGKey(0), n_steps=n_steps,
                            accel=accel)
    assert np.isfinite(np.asarray(losses)).all()   # forced warmup
    t0 = time.perf_counter()
    p, losses = train_steps(p, skeleton, cfg, ids, target,
                            jax.random.PRNGKey(1), n_steps=n_steps,
                            accel=accel)
    assert np.isfinite(np.asarray(losses)).all()
    per_step = (time.perf_counter() - t0) / n_steps
    out.update({pref + "rays_per_sec": round(n / per_step, 1),
                pref + "rays": n, pref + "spp": spp,
                pref + "steps_per_call": n_steps})
    return out


def phase_mesh(args):
    """Scaling-efficiency measurement at ONE mesh size (args.mesh).

    The parent aggregates sizes 1..N into rays/s + efficiency rows
    (BASELINE.json: >=85% efficiency target on real pods).  Each size
    runs in its own process: one compiled program per process (tunnel
    quirk #2), and re-sharding the same committed arrays onto a grown
    mesh trips jax-0.9 jit-cache sharp edges.  On the single-TPU tunnel
    this runs on a virtual CPU mesh — the numbers check sharding
    overhead, not chip throughput."""
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize latches the axon platform at interpreter start;
        # honoring the env var needs the live-config override (quirk #3)
        jax.config.update("jax_platforms", "cpu")
    from simd_raytracer_tpu import RenderConfig
    from simd_raytracer_tpu.parallel.sharding import (make_mesh,
                                                      render_frame_sharded)

    scene = _load(args.scene, args.scale)
    cfg = RenderConfig(samples_per_pixel=args.spp, chunk_size=args.chunk,
                       intersector=args.intersector,
                       bounce_mode=args.bounce_mode)
    rays = scene.height * scene.width * args.spp
    nd = args.mesh
    if nd > len(jax.devices()):
        # Never silently clamp: a 1-device host would "measure" every
        # size on one device and report trivial 1.0 efficiency.  The
        # parent forces a virtual CPU mesh of the right size.
        raise SystemExit(f"mesh size {nd} > {len(jax.devices())} "
                         f"available {jax.default_backend()} devices")
    mesh = make_mesh(nd)
    accel = _build_accel(scene, cfg.intersector)   # sweep/kdtree need it
    _force(render_frame_sharded(scene, cfg, mesh, accel=accel))
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(render_frame_sharded(scene, cfg, mesh, accel=accel))
    dt = (time.perf_counter() - t0) / reps
    return {"mesh_devices": nd, "mesh_rays_per_sec": round(rays / dt, 1),
            "mesh_backend": jax.default_backend()}


PHASES = {
    "headline": phase_forward,
    "refexact": phase_refexact,
    "dragon": phase_dragon,
    "backward": phase_backward,
    "northstar": lambda a: phase_backward(a, spp=128, gi=1, fd_check=True),
    "mesh": phase_mesh,
}


# ------------------------------------------------------- result plumbing

def _probe_devices():
    """Device count + backend WITHOUT holding a client in this process.

    The parent must never own the TPU while a child needs it (libtpu's
    per-process exclusivity: a child init against held devices hangs and
    a hung child wedges the tunnel, quirk #7) — probe in a throwaway
    subprocess instead."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(len(d), jax.default_backend(), str(d[0]))"],
            capture_output=True, text=True, timeout=180)
        n, backend, dev = r.stdout.strip().splitlines()[-1].split(None, 2)
        return int(n), backend, dev
    except Exception:
        return 1, "unknown", "unknown"


def _result_line(headline, detail):
    value = headline["rays_per_sec"] if headline else 0
    return {"metric": "primary_rays_per_sec_hw15s2", "value": value,
            "unit": "rays/s", "vs_baseline": round(value / BASELINE, 3),
            "detail": detail}


def _emit(result):
    """Print the metric line NOW and snapshot it to BENCH_partial.json.

    Called after every completed phase: a later phase timing out (or the
    driver signalling the parent) can never erase an earlier phase's
    number — the last complete line on stdout always parses."""
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(PARTIAL_PATH, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/scenes/hw15/scene2.crtscene")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--scale", type=float, default=0.5,
                    help="resolution scale on the scene's native HxW")
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--intersector", default="sweep",
                    choices=["jnp", "fast", "pallas", "mxu", "kdtree",
                             "sweep"])
    ap.add_argument("--bounce-mode", default="roulette",
                    choices=["split", "roulette"])
    ap.add_argument("--quick", action="store_true",
                    help="headline + backward phases only")
    ap.add_argument("--mesh", type=int, default=0,
                    help="run the sharded scaling harness up to N devices")
    ap.add_argument("--northstar", action="store_true",
                    help="run the 128-spp GI fwd+bwd + FD check phase")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1500)),
                    help="global wall-clock budget in seconds")
    ap.add_argument("--_phase", default=None, choices=list(PHASES),
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    deadline = time.time() + args.budget

    if args._phase is not None:
        out = PHASES[args._phase](args)
        print(json.dumps(out))
        return 0

    if args.mesh:
        # one subprocess per mesh size; aggregate efficiency here
        n_real, backend, _ = _probe_devices()
        sizes = [s for s in (1, 2, 4, 8) if s <= args.mesh]
        rows = {}
        for nd in sizes:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--scene", args.scene, "--spp", str(args.spp),
                   "--scale", str(args.scale), "--chunk", str(args.chunk),
                   "--intersector", args.intersector,
                   "--bounce-mode", args.bounce_mode,
                   "--mesh", str(nd), "--_phase", "mesh"]
            env = dict(os.environ)
            use_real = env.get("BENCH_MESH_REAL") or nd <= n_real > 1
            if not use_real:
                # Not enough real devices (the single-TPU tunnel):
                # measure sharding overhead on a virtual CPU mesh sized
                # to the request, as conftest.py does.  Multi-device
                # hosts (or BENCH_MESH_REAL=1) use the real devices.
                sys.stderr.write(f"[mesh {nd}: virtual CPU mesh "
                                 f"({n_real} real devices)]\n")
                env["JAX_PLATFORMS"] = "cpu"
                flags = [f for f in env.get("XLA_FLAGS", "").split()
                         if "xla_force_host_platform_device_count"
                         not in f]
                flags.append("--xla_force_host_platform_"
                             f"device_count={nd}")
                env["XLA_FLAGS"] = " ".join(flags)
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600, env=env)
            if r.returncode != 0 or not r.stdout.strip():
                sys.stderr.write(f"[mesh {nd} failed]\n"
                                 + r.stderr[-2000:] + "\n")
                continue
            out = json.loads(r.stdout.strip().splitlines()[-1])
            rows[out["mesh_devices"]] = out["mesh_rays_per_sec"]
        if not rows:
            print(json.dumps({"metric": "mesh_scaling", "value": 0,
                              "unit": "rays/s", "vs_baseline": 0}))
            return 1
        base_nd = min(rows)
        eff = {nd: round(v / (rows[base_nd] * nd / base_nd), 3)
               for nd, v in rows.items()}
        top = max(rows)
        print(json.dumps({
            "metric": f"sharded_rays_per_sec_{top}dev",
            "value": rows[top], "unit": "rays/s",
            "vs_baseline": round(rows[top] / BASELINE, 3),
            "detail": {"mesh_rays_per_sec": rows,
                       "mesh_scaling_efficiency": eff}}))
        return 0

    if args.northstar:
        phases = ["northstar"]
    elif args.quick:
        phases = ["headline", "backward"]
    else:
        # Headline FIRST: its number is the gated metric; everything
        # after only enriches detail.  northstar runs last, only with
        # spare budget (it is the heaviest compile).
        phases = ["headline", "dragon", "refexact", "backward",
                  "northstar"]

    base = [sys.executable, os.path.abspath(__file__),
            "--scene", args.scene, "--spp", str(args.spp),
            "--scale", str(args.scale), "--chunk", str(args.chunk),
            "--repeats", str(args.repeats),
            "--intersector", args.intersector,
            "--bounce-mode", args.bounce_mode,
            "--mesh", str(args.mesh)]
    detail = {"phases_done": []}
    headline = None
    abandoned = False
    state = {"result": _result_line(None, detail)}

    def _on_signal(signum, frame):
        # The driver's timeout signals the parent only (children are in
        # their own process groups from its point of view): flush the
        # best-known line and exit cleanly so stdout stays parseable.
        sys.stderr.write(f"[signal {signum}: emitting partial result]\n")
        _emit(state["result"])
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    # Per-phase overrides: fwd+bwd throughput grows with batch size
    # (677.7k/715.1k/760.9k rays/s at 16k/32k/64k, BENCH.md §1) while
    # render phases LOSE at bigger chunks (coarser compaction) — the
    # backward phase gets its own measured-best chunk.
    extra = {"backward": ["--chunk", "65536"]}
    for ph in phases:
        remaining = deadline - time.time()
        floor = 300 if ph == "northstar" else 45
        if remaining < floor:
            sys.stderr.write(f"[phase {ph} skipped: {remaining:.0f}s "
                             "of budget left]\n")
            continue
        proc = subprocess.Popen(base + extra.get(ph, []) + ["--_phase", ph],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        try:
            stdout, stderr = proc.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            # NEVER kill a TPU process mid-compile/execute — it wedges
            # the tunnel for every later program (quirk #7).  Abandon
            # the child (it finishes on its own) and stop launching:
            # the orphan still owns the chip.
            sys.stderr.write(f"[phase {ph} over budget: abandoned "
                             "un-killed; emitting what we have]\n")
            abandoned = True
            break
        if proc.returncode != 0 or not stdout.strip():
            sys.stderr.write(f"[phase {ph} failed]\n" + stderr[-2000:]
                             + "\n")
            continue
        out = json.loads(stdout.strip().splitlines()[-1])
        if ph == "headline":
            headline = out
        detail.update(out)
        detail["phases_done"].append(ph)
        state["result"] = _result_line(headline, detail)
        _emit(state["result"])

    if headline is None:
        _emit(state["result"])
        return 1
    detail["scene"] = args.scene
    if not abandoned:
        # Device string via probe (the parent itself never opens the
        # TPU); skipped when an abandoned child still owns the tunnel —
        # a probe hanging against it would have to be killed (quirk #7).
        _, _, dev = _probe_devices()
        detail["device"] = dev
    _emit(_result_line(headline, detail))
    return 0


if __name__ == "__main__":
    sys.exit(main())
