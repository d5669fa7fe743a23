"""Block-sparse sweep intersector (accel/sweep.py + ops/intersect_sweep.py)
vs brute force — winners must be identical (shared accelerator contract,
reference accel/accel.hpp:8-12)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import SCENES
from simd_raytracer_tpu import RenderConfig, parse_scene_file, render_frame
from simd_raytracer_tpu.accel.sweep import build_sweep_for_scene
from simd_raytracer_tpu.models.scene import derive_geometry
from simd_raytracer_tpu.ops.intersect import mt_select
from simd_raytracer_tpu.ops.intersect_sweep import make_sweep_select


def _rand_rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.asarray(scene.cam_pos), (n, 1)).astype(np.float32)
    o[n // 2:] += rng.normal(scale=2.0, size=(n // 2, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_slices_cover_all_triangles():
    scene = parse_scene_file(str(SCENES / "hw11/scene8.crtscene"))
    sweep = build_sweep_for_scene(scene)
    ids = np.asarray(sweep.tri_ids)
    present = np.unique(ids[ids >= 0])
    valid = np.flatnonzero(np.asarray(scene.tri_valid))
    assert np.isin(valid, present).all()
    # slice AABBs contain their member triangles
    from simd_raytracer_tpu.accel.build import triangle_aabbs
    tri_min, tri_max = triangle_aabbs(np.asarray(scene.vertices),
                                      np.asarray(scene.tri_vidx))
    aabb = np.asarray(sweep.aabb)
    for s in range(min(16, sweep.num_slices)):
        tris = ids[s][ids[s] >= 0]
        assert (tri_min[tris] >= aabb[s, 0:3] - 1e-6).all()
        assert (tri_max[tris] <= aabb[s, 3:6] + 1e-6).all()


@pytest.mark.parametrize("cull", [True, False])
def test_sweep_select_matches_brute_force(cull):
    scene = parse_scene_file(str(SCENES / "hw11/scene8.crtscene"))
    geom = derive_geometry(scene)
    sel = make_sweep_select(build_sweep_for_scene(scene))
    o, d = _rand_rays(scene, 512)
    bi, bh = mt_select(o, d, geom.v0, geom.e1, geom.e2, 1e-6, cull,
                       geom.tri_valid)
    si, sh = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, cull,
                 geom.tri_valid)
    assert (np.asarray(bh) == np.asarray(sh)).all()
    hb = np.asarray(bh)
    assert (np.asarray(bi)[hb] == np.asarray(si)[hb]).all()


def test_sweep_tmax_window_and_any_hit():
    """t_max drops hits at/beyond the window; any_hit matches the
    occlusion predicate (exists accepted hit with t < t_max)."""
    scene = parse_scene_file(str(SCENES / "hw11/scene8.crtscene"))
    geom = derive_geometry(scene)
    sel = make_sweep_select(build_sweep_for_scene(scene))
    o, d = _rand_rays(scene, 512, seed=3)
    bi, bh = mt_select(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                       geom.tri_valid)
    from simd_raytracer_tpu.ops.intersect import mt_refine
    bt, _, _ = mt_refine(o, d, geom.v0[bi], geom.e1[bi], geom.e2[bi])
    bt = np.where(np.asarray(bh), np.asarray(bt), np.inf)

    # window below every hit -> no hits; window above -> same winners
    _, sh_lo = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                   geom.tri_valid, t_max=jnp.full(512, 1e-3))
    assert not np.asarray(sh_lo).any()
    si_hi, sh_hi = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                       geom.tri_valid, t_max=jnp.full(512, 1e9))
    assert (np.asarray(sh_hi) == np.asarray(bh)).all()
    hb = np.asarray(bh)
    assert (np.asarray(si_hi)[hb] == np.asarray(bi)[hb]).all()

    # a mid window keeps exactly the hits strictly inside it (rays whose
    # winner t sits AT the window edge are ulp-order dependent — skip)
    tm_val = float(np.median(bt[np.isfinite(bt)]))
    tmax = jnp.full(512, tm_val)
    _, sh_mid = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                    geom.tri_valid, t_max=tmax)
    expect = bt < tm_val
    off_edge = np.abs(bt - tm_val) > 1e-5 * tm_val
    assert (np.asarray(sh_mid) == expect)[off_edge].all()

    # any_hit returns the same predicate for every window
    for tm in (jnp.full(512, 1e-3), tmax, jnp.full(512, 1e9)):
        _, sh_c = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                      geom.tri_valid, t_max=tm)
        _, sh_a = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                      geom.tri_valid, t_max=tm, any_hit=True)
        assert (np.asarray(sh_a) == np.asarray(sh_c)).all()


def test_sweep_streaming_path_matches_brute_force(monkeypatch):
    """The non-resident (streaming) kernel — slice blocks DMA'd per grid
    step through the scalar-prefetched front-to-back schedule — must
    produce the same winners as brute force, including t_max/any_hit."""
    import simd_raytracer_tpu.ops.intersect_sweep as isw
    monkeypatch.setattr(isw, "RESIDENT_MAX_BYTES", 0)
    scene = parse_scene_file(str(SCENES / "hw11/scene8.crtscene"))
    geom = derive_geometry(scene)
    sel = make_sweep_select(build_sweep_for_scene(scene))
    o, d = _rand_rays(scene, 512, seed=11)
    bi, bh = mt_select(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                       geom.tri_valid)
    si, sh = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                 geom.tri_valid)
    assert (np.asarray(bh) == np.asarray(sh)).all()
    hb = np.asarray(bh)
    assert (np.asarray(bi)[hb] == np.asarray(si)[hb]).all()
    # any-hit predicate with a finite window agrees with closest-hit
    tm = jnp.full(512, 1e9)
    _, sh_c = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                  geom.tri_valid, t_max=tm)
    _, sh_a = sel(o, d, geom.v0, geom.e1, geom.e2, 1e-6, False,
                  geom.tri_valid, t_max=tm, any_hit=True)
    assert (np.asarray(sh_a) == np.asarray(sh_c)).all()


def test_sweep_render_equals_brute_force():
    scene = parse_scene_file(str(SCENES / "hw15/scene2.crtscene")).replace(
        height=18, width=24)
    a = np.asarray(render_frame(
        scene, RenderConfig(chunk_size=512, max_ray_depth=3)))
    b = np.asarray(render_frame(
        scene, RenderConfig(chunk_size=512, max_ray_depth=3,
                            intersector="sweep")))
    assert np.array_equal(a, b)
