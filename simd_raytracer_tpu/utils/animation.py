"""Animation rendering: camera paths -> frame sequences.

The reference repo ships a rendered orbit video in outputs/ and a camera
movement API it never wires up (reference: scene/camera.hpp:13-66 —
truck/pedestal/dolly/pan/tilt/roll, dead code from main).  Here the same
API (models/camera.py) drives actual frame sequences; frames reuse one
compiled render (same shapes), so animation cost is render-bound.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List, Optional

import numpy as np

from ..config import RenderConfig
from ..models import camera as cam
from ..models.scene import Scene


def orbit_path(scene: Scene, n_frames: int, degrees_per_frame: float = None,
               ) -> Iterable[Scene]:
    """Turntable: pan the camera around the vertical axis through the
    scene centroid, keeping distance fixed."""
    if degrees_per_frame is None:
        degrees_per_frame = 360.0 / n_frames
    center = np.asarray(scene.vertices).mean(axis=0)
    for i in range(n_frames):
        ang = np.radians(degrees_per_frame * i)
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        pos0 = np.asarray(scene.cam_pos) - center
        pos = center + pos0 @ rot.T
        mat = np.asarray(scene.cam_mat) @ rot.T
        import jax.numpy as jnp
        yield scene.replace(cam_pos=jnp.asarray(pos.astype(np.float32)),
                            cam_mat=jnp.asarray(mat.astype(np.float32)))


def dolly_path(scene: Scene, n_frames: int, total_dist: float
               ) -> Iterable[Scene]:
    """Dolly in/out along the view axis (camera.hpp:31-33 semantics)."""
    step = total_dist / max(1, n_frames - 1)
    s = scene
    for i in range(n_frames):
        yield s
        s = cam.dolly(s, step)


def render_animation(
    frames: Iterable[Scene],
    cfg: RenderConfig = RenderConfig(),
    out_dir: Optional[str] = None,
    prefix: str = "frame",
    accel=None,
    on_frame: Optional[Callable[[int, np.ndarray], None]] = None,
) -> List[np.ndarray]:
    """Render a scene sequence; optionally write frame_%04d.ppm files.

    All frames share shapes, so only the first pays compilation; the rest
    are pipelined dispatches.
    """
    from ..ops.render import render_frame
    from .ppm import save_ppm

    out = []
    for i, scene in enumerate(frames):
        img = np.asarray(render_frame(scene, cfg, accel=accel))
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            save_ppm(img, os.path.join(out_dir, f"{prefix}_{i:04d}.ppm"))
        if on_frame:
            on_frame(i, img)
        out.append(img)
    return out
