"""Pallas TPU kernel for the closest-hit selection sweep.

This is the TPU-native rebuild of the reference's namesake hot kernel —
the width-W SIMD Moller-Trumbore over triangle packets
(reference: include/raytracer/render/accel/kd_tree_simd.hpp:26-60) with its
mask-compose / hmin / find_first_set winner pick (:266-302).  Lanes of
`std::experimental::native_simd` become VPU lanes: each grid step
intersects an (R_TILE rays x T_TILE triangles) block entirely in VMEM,
with rays on sublanes and triangles on lanes, and folds the block winner
into per-ray (best_t, best_idx) carried in VMEM scratch across the
triangle-block grid dimension.

The kernel is select-only (discrete winner choice, wrapped in
stop_gradient by ops.intersect.trace); the differentiable refine pass
stays in plain JAX.

Determinism matches the reference: ties on t resolve to the lowest
triangle index, like `find_first_set` picks the lowest winning lane
(kd_tree_simd.hpp:290).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38          # python literals: jnp constants would be captured
IMAX = 2**31 - 1      # as implicit kernel inputs, which pallas rejects

R_TILE = 512    # rays per block (sublane-major)
T_TILE = 512    # triangles per block (lane-major)


def _kernel(o_ref, d_ref, tmax_ref, tri_ref, mask_ref, idx_out, hit_out,
            best_t, best_i, *, eps: float, cull: bool, any_hit: bool):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_t[:] = jnp.full_like(best_t, BIG)
        best_i[:] = jnp.full_like(best_i, IMAX)

    # Ray components as (R, 1) columns; triangle SoA rows as (1, T).
    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    v0x, v0y, v0z = tri_ref[0:1, :], tri_ref[1:2, :], tri_ref[2:3, :]
    e1x, e1y, e1z = tri_ref[3:4, :], tri_ref[4:5, :], tri_ref[5:6, :]
    e2x, e2y, e2z = tri_ref[6:7, :], tri_ref[7:8, :], tri_ref[8:9, :]

    # Moller-Trumbore, all 9 dot/cross products as (R, T) VPU lane ops
    # (kd_tree_simd.hpp:27-58 lane-for-lane).
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    if cull:
        ok = det > eps
    else:
        ok = jnp.abs(det) > eps
    inv_det = 1.0 / jnp.where(ok, det, 1.0)

    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)

    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)

    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok &= t > eps
    ok &= mask_ref[0:1, :] > 0
    if any_hit:
        # Occlusion predicate (render.hpp:110-131): inclusive window,
        # hit-ness only — the winner reduces to one `any` folded into
        # the best_i scratch as a 0/IMAX flag.
        ok &= t <= tmax_ref[:]
        blk_hit = jnp.any(ok, axis=1, keepdims=True)
        best_i[:] = jnp.where(blk_hit, 0, best_i[:])

        @pl.when(j == nt - 1)
        def _():
            hit_out[:] = (best_i[:] == 0).astype(jnp.int32)
            idx_out[:] = jnp.zeros_like(idx_out)
        return

    t_m = jnp.where(ok, t, BIG)
    blk_t = jnp.min(t_m, axis=1, keepdims=True)                 # (R, 1)
    lane = (jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
            + j * T_TILE)
    blk_i = jnp.min(jnp.where(t_m == blk_t, lane, IMAX),
                    axis=1, keepdims=True)                      # (R, 1)

    # Merge with the running winner; lowest index wins exact-t ties.
    cur_t, cur_i = best_t[:], best_i[:]
    upd = (blk_t < cur_t) | ((blk_t == cur_t) & (blk_i < cur_i))
    best_t[:] = jnp.where(upd, blk_t, cur_t)
    best_i[:] = jnp.where(upd, blk_i, cur_i)

    @pl.when(j == nt - 1)
    def _():
        won = best_t[:] < BIG
        # t_max without any_hit: closest hit must also sit inside the
        # inclusive window (callers wanting the winner within range).
        inwin = best_t[:] <= tmax_ref[:]
        idx_out[:] = jnp.where(won, best_i[:], 0)
        hit_out[:] = (won & inwin).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("eps", "cull", "any_hit",
                                             "interpret"))
def _select_call(o, d, tmax, tri, mask, eps: float, cull: bool,
                 any_hit: bool = False, interpret: bool = False):
    r = o.shape[0]
    t = tri.shape[1]
    grid = (pl.cdiv(r, R_TILE), pl.cdiv(t, T_TILE))
    kern = functools.partial(_kernel, eps=eps, cull=cull, any_hit=any_hit)
    idx, hit = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R_TILE, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, T_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_TILE, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R_TILE, 1), jnp.float32),
            pltpu.VMEM((R_TILE, 1), jnp.int32),
        ],
        interpret=interpret,
    )(o, d, tmax, tri, mask)
    return idx[:, 0], hit[:, 0]


def pack_triangles(v0, e1, e2):
    """Host/trace-side SoA packing: (T,3)x3 -> (9, T) f32 row-per-component
    (the Pallas analog of triangle_packet's nine lane-vectors,
    kd_tree_simd.hpp:16-24)."""
    return jnp.concatenate([v0.T, e1.T, e2.T], axis=0).astype(jnp.float32)


def mt_select_pallas(o, d, v0, e1, e2, eps, cull, tri_mask=None,
                     t_max=None, any_hit=False, interpret=None):
    """Drop-in replacement for ops.intersect.mt_select on TPU.

    t_max/any_hit follow the common select contract (inclusive window,
    any-accepted-hit predicate).  Falls back to interpret mode
    automatically off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = o.shape[0]
    t = v0.shape[0]
    tri = pack_triangles(v0, e1, e2)
    if tri_mask is None:
        mask = jnp.ones((1, t), jnp.int32)
    else:
        mask = tri_mask.astype(jnp.int32).reshape(1, t)
    if t_max is None:
        tmax = jnp.full((r, 1), BIG, jnp.float32)
    else:
        tmax = t_max.astype(jnp.float32).reshape(r, 1)
    # pad rays to R_TILE multiple; triangles are already padded by the
    # scene builder (models/scene.py TRI_PAD), pad again defensively.
    rp = -(-r // R_TILE) * R_TILE
    tp = -(-t // T_TILE) * T_TILE
    if rp != r:
        o = jnp.pad(o, ((0, rp - r), (0, 0)))
        d = jnp.pad(d, ((0, rp - r), (0, 0)), constant_values=1.0)
        tmax = jnp.pad(tmax, ((0, rp - r), (0, 0)))   # window 0: no hits
    if tp != t:
        tri = jnp.pad(tri, ((0, 0), (0, tp - t)))
        mask = jnp.pad(mask, ((0, 0), (0, tp - t)))
    o32 = o.astype(jnp.float32)
    d32 = d.astype(jnp.float32)
    idx, hit = _select_call(o32, d32, tmax, tri, mask, float(eps),
                            bool(cull), any_hit=bool(any_hit),
                            interpret=bool(interpret))
    return idx[:r], hit[:r].astype(bool)
