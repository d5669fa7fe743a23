"""Progressive rendering with checkpoint/resume.

The reference renders one shot and exits; its only artifact is the final
image.ppm (reference: src/main.cpp:23-24).  For long GI renders (512 spp,
README.md:46-48 configs) and preemptible multi-host runs, this module
streams samples in batches and checkpoints the accumulation buffer, so a
killed render resumes at the last completed batch (SURVEY.md §5
checkpoint/resume).  State is a plain npz: sample-sum image + samples
done + a fingerprint guarding against resuming someone else's buffer.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np

from ..config import RenderConfig
from ..models.scene import Scene


def _fingerprint(scene: Scene, cfg: RenderConfig,
                 spp_per_batch: int) -> str:
    """Hash of EVERY sampling-relevant setting plus the scene contents.

    All RenderConfig fields participate (bounce_mode, occlusion_mode,
    epsilon/bias constants, ... — any of them changes what a sample
    means), as does spp_per_batch (it determines the per-batch RNG key
    schedule).  A resumed buffer must therefore have been rendered under
    the exact same estimator, or it restarts from scratch.
    """
    import dataclasses
    import hashlib

    h = hashlib.sha256()
    h.update(repr((scene.height, scene.width, spp_per_batch,
                   dataclasses.astuple(cfg))).encode())
    for leaf in jax.tree_util.tree_leaves(scene):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:32]


def render_progressive(
    scene: Scene,
    cfg: RenderConfig,
    total_spp: int,
    spp_per_batch: int = 8,
    checkpoint_path: Optional[str] = None,
    on_batch: Optional[Callable[[int, np.ndarray], None]] = None,
    accel=None,
) -> np.ndarray:
    """Render total_spp samples/pixel in resumable batches -> (H, W, 3).

    Each batch renders `spp_per_batch` fresh samples with an independent
    fold of the frame key (counter-based RNG: batch b reuses nothing from
    batch b-1), accumulates the sample sum, and checkpoints.  Resume skips
    completed batches and reproduces the identical final image because
    batch keys depend only on (seed, batch index).

    on_batch(samples_done, running_mean_image) is a progress hook.
    """
    from ..ops.render import render_frame

    if total_spp % spp_per_batch != 0:
        raise ValueError("total_spp must be a multiple of spp_per_batch")
    n_batches = total_spp // spp_per_batch
    h, w = scene.height, scene.width
    fp = _fingerprint(scene, cfg, spp_per_batch)

    accum = np.zeros((h, w, 3), np.float64)
    done = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path, allow_pickle=False)
        if str(ck["fingerprint"]) == fp:
            accum = ck["accum"]
            done = int(ck["samples_done"])
        else:
            # A long GI render resumed under a different scene/config
            # would silently throw away hours — say so loudly.
            import warnings
            warnings.warn(
                f"checkpoint {checkpoint_path!r} was written for a "
                f"different scene/config (fingerprint "
                f"{str(ck['fingerprint'])[:8]}... != {fp[:8]}...); "
                f"restarting from scratch ("
                f"{int(ck['samples_done'])} samples discarded)",
                stacklevel=2)

    batch_cfg = RenderConfig(**{
        **{f.name: getattr(cfg, f.name)
           for f in cfg.__dataclass_fields__.values()},
        "samples_per_pixel": spp_per_batch})

    seed = cfg.rng_seed if cfg.rng_seed is not None else 0
    base_key = jax.random.PRNGKey(seed)

    for b in range(done // spp_per_batch, n_batches):
        key = jax.random.fold_in(base_key, b)
        img = np.asarray(render_frame(scene, batch_cfg, key, accel),
                         np.float64)
        accum += img * spp_per_batch
        done += spp_per_batch
        if checkpoint_path:
            tmp = checkpoint_path + ".tmp.npz"   # .npz suffix: savez keeps it
            np.savez(tmp, accum=accum, samples_done=done, fingerprint=fp)
            os.replace(tmp, checkpoint_path)     # atomic swap
        if on_batch:
            on_batch(done, (accum / max(done, 1)).astype(np.float32))

    return (accum / max(done, 1)).astype(np.float32)
