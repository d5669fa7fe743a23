"""Block-sparse Pallas sweep: closest hit via AABB-culled slice packets.

Grid = (ray tiles, slices).  Each step holds one 256-ray tile and one
128-triangle slice (accel/sweep.py) in VMEM; a slab test of the tile
against the slice's tight AABB gates the packet Moller-Trumbore behind
`@pl.when`, so the VPU only pays for (tile, slice) pairs that can
intersect — the attention-style block-sparsity trick applied to ray
tracing.  This is the performance-bearing rebuild of the reference's
namesake kernel: the same 9-lane-vector packet intersect + running-winner
merge as kd_tree_simd.hpp:26-60/:266-302, with the kd *traversal* replaced
by dense streaming + culling (SURVEY.md §7: "brute-force Pallas over all
triangles may beat traversal — measure"; this keeps the stream but skips
the dead blocks).

Per-ray running winners (best_t, best id) live in VMEM scratch across the
slice grid dimension; ties resolve to the lowest global triangle id, so
results are identical to every other backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38
IMAX = 2**31 - 1

R_TILE = 512


def _kernel(o_ref, d_ref, tmax_ref, tri_ref, aabb_ref, ids_ref, mask_ref,
            idx_out, hit_out, best_t, best_i, *, eps: float, cull: bool,
            any_hit: bool):
    j = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        # Seeding the running winner with the caller's t_max culls every
        # slice beyond it (shadow rays stop at the light) — hits at
        # exactly t_max are dropped, matching is_occluded's strict march
        # window shrinking (render.hpp:121-128 re-origins past the hit).
        best_t[:] = tmax_ref[:]
        best_i[:] = jnp.full_like(best_i, IMAX)

    o = o_ref[:]                      # (R, 3)
    d = d_ref[:]
    inv_d = 1.0 / d
    bmin = aabb_ref[0, :, 0:3]        # (1, 3)
    bmax = aabb_ref[0, :, 3:6]
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    lo = jnp.where(jnp.isnan(lo), -BIG, lo)
    hi = jnp.where(jnp.isnan(hi), BIG, hi)
    t_near = jnp.maximum(jnp.max(lo, axis=1, keepdims=True), 0.0)  # (R,1)
    t_far = jnp.min(hi, axis=1, keepdims=True)
    # Empty slices carry an inverted sentinel box; the per-axis lo/hi
    # swap above would re-validate it, so cull on box validity explicitly.
    box_valid = jnp.all(bmax >= bmin)
    reach = (t_far >= t_near) & (t_near <= best_t[:]) & box_valid

    @pl.when(jnp.any(reach))
    def _():
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]       # (R, 1)
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        v0x, v0y, v0z = tri_ref[0, 0:1, :], tri_ref[0, 1:2, :], \
            tri_ref[0, 2:3, :]                              # (1, T)
        e1x, e1y, e1z = tri_ref[0, 3:4, :], tri_ref[0, 4:5, :], \
            tri_ref[0, 5:6, :]
        e2x, e2y, e2z = tri_ref[0, 6:7, :], tri_ref[0, 7:8, :], \
            tri_ref[0, 8:9, :]

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
        ok &= mask_ref[0] > 0                               # (1, T)
        ok &= reach                                         # per-ray gate

        gid = ids_ref[0]                                    # (1, T) i32
        t_m = jnp.where(ok, t, BIG)
        blk_t = jnp.min(t_m, axis=1, keepdims=True)
        blk_i = jnp.min(jnp.where(t_m == blk_t, gid, IMAX),
                        axis=1, keepdims=True)
        cur_t, cur_i = best_t[:], best_i[:]
        # blk_t == BIG rows (no accepted lane) tie-match every lane in
        # the where() above, so blk_i is a bogus min(gid) there — gate
        # the whole update on a real candidate t.
        upd = ((blk_t < cur_t)
               | ((blk_t == cur_t) & (blk_i < cur_i))) & (blk_t < BIG)
        best_t[:] = jnp.where(upd, blk_t, cur_t)
        best_i[:] = jnp.where(upd, blk_i, cur_i)
        if any_hit:
            # Occlusion only needs the predicate: once a ray has any
            # accepted hit inside its window, best_t = -1 fails the
            # t_near >= 0 reach test for every remaining slice.
            best_t[:] = jnp.where(best_i[:] != IMAX, -1.0, best_t[:])

    @pl.when(j == ns - 1)
    def _():
        won = best_i[:] != IMAX
        idx_out[:] = jnp.where(won, best_i[:], 0)
        hit_out[:] = won.astype(jnp.int32)


def _kernel_resident(o_ref, d_ref, tmax_ref, tri_ref, aabb_ref, ids_ref,
                     mask_ref, idx_out, hit_out, *, eps: float,
                     cull: bool, any_hit: bool, n_slices: int):
    """Scene-resident variant: grid = ray tiles ONLY; the whole sliced
    triangle soup lives in VMEM (a reference-scale scene is ~150 KB) and
    the slice sweep is an in-kernel loop whose Moller-Trumbore body is
    gated per slice by the tile's slab test.  Culled slices cost a
    handful of VPU ops — no per-step DMA, no grid-step dispatch — which
    is what the (tile, slice) grid version pays even for dead blocks.
    """
    o = o_ref[:]                      # (R, 3)
    d = d_ref[:]
    inv_d = 1.0 / d
    r = o.shape[0]

    def slice_step(j, carry):
        best_t, best_i = carry
        bmin = aabb_ref[j, :, 0:3]        # (1, 3)
        bmax = aabb_ref[j, :, 3:6]
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        lo = jnp.where(jnp.isnan(lo), -BIG, lo)
        hi = jnp.where(jnp.isnan(hi), BIG, hi)
        t_near = jnp.maximum(jnp.max(lo, axis=1, keepdims=True), 0.0)
        t_far = jnp.min(hi, axis=1, keepdims=True)
        box_valid = jnp.all(bmax >= bmin)
        reach = (t_far >= t_near) & (t_near <= best_t) & box_valid

        def mt(_):
            ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
            dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
            tri = tri_ref[j]                                # (9, T)
            v0x, v0y, v0z = tri[0:1, :], tri[1:2, :], tri[2:3, :]
            e1x, e1y, e1z = tri[3:4, :], tri[4:5, :], tri[5:6, :]
            e2x, e2y, e2z = tri[6:7, :], tri[7:8, :], tri[8:9, :]

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
            ok &= mask_ref[j] > 0                           # (1, T)
            ok &= reach

            gid = ids_ref[j]                                # (1, T)
            t_m = jnp.where(ok, t, BIG)
            blk_t = jnp.min(t_m, axis=1, keepdims=True)
            blk_i = jnp.min(jnp.where(t_m == blk_t, gid, IMAX),
                            axis=1, keepdims=True)
            upd = ((blk_t < best_t)
                   | ((blk_t == best_t) & (blk_i < best_i))) \
                & (blk_t < BIG)
            new_t = jnp.where(upd, blk_t, best_t)
            new_i = jnp.where(upd, blk_i, best_i)
            if any_hit:
                new_t = jnp.where(new_i != IMAX, -1.0, new_t)
            return new_t, new_i

        return jax.lax.cond(jnp.any(reach), mt,
                            lambda _: (best_t, best_i), 0)

    init = (jnp.broadcast_to(tmax_ref[:], (r, 1)),
            jnp.full((r, 1), IMAX, jnp.int32))
    best_t, best_i = jax.lax.fori_loop(0, n_slices, slice_step, init)
    won = best_i != IMAX
    idx_out[:] = jnp.where(won, best_i, 0)
    hit_out[:] = won.astype(jnp.int32)


# Scenes whose sliced soup fits comfortably resident in VMEM use the
# in-kernel slice loop; bigger scenes stream slices via the grid.
RESIDENT_MAX_BYTES = 6 << 20


@functools.partial(jax.jit,
                   static_argnames=("eps", "cull", "any_hit", "r_tile",
                                    "interpret"))
def _sweep_call_resident(o, d, tmax, tri_soa, aabb, ids, mask, eps: float,
                         cull: bool, any_hit: bool = False,
                         r_tile: int = R_TILE, interpret: bool = False):
    r = o.shape[0]
    s = tri_soa.shape[0]
    t = tri_soa.shape[2]
    kern = functools.partial(_kernel_resident, eps=eps, cull=cull,
                             any_hit=any_hit, n_slices=s)
    idx, hit = pl.pallas_call(
        kern,
        grid=(pl.cdiv(r, r_tile),),
        in_specs=[
            pl.BlockSpec((r_tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 9, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1, 8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1, t), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(o, d, tmax, tri_soa, aabb[:, None, :], ids[:, None, :],
      mask[:, None, :])
    return idx[:, 0], hit[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("eps", "cull", "any_hit", "r_tile",
                                    "interpret"))
def _sweep_call(o, d, tmax, tri_soa, aabb, ids, mask, eps: float,
                cull: bool, any_hit: bool = False, r_tile: int = R_TILE,
                interpret: bool = False):
    R_TILE = r_tile
    r = o.shape[0]
    s = tri_soa.shape[0]
    t = tri_soa.shape[2]
    grid = (pl.cdiv(r, R_TILE), s)
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
            pl.BlockSpec((1, 9, t), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            # 3-D (S, 1, x) layouts: Mosaic wants the last two block dims
            # divisible by (8, 128) or equal to the array dims; (1, x)
            # blocks of a 2-D (S, x) array violate the sublane rule.
            pl.BlockSpec((1, 1, 8), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (j, 0, 0),
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
    )(o, d, tmax, tri_soa, aabb[:, None, :], ids[:, None, :],
      mask[:, None, :])
    return idx[:, 0], hit[:, 0]


def make_sweep_select(sweep, interpret: Optional[bool] = None,
                      r_tile: Optional[int] = None):
    """Bind SweepData into the common select signature
    (o, d, v0, e1, e2, eps, cull, tri_mask) -> (idx, hit).

    v0/e1/e2 are ignored — slice geometry was packed at build time
    (select is stop-gradiented; the differentiable refine re-derives the
    winner's t/u/v from live vertices, ops/intersect.py).

    Extra (sweep-only) kwargs: t_max (N,) drops hits at or beyond it and
    culls the slices past it; any_hit=True returns the first accepted
    hit inside the window instead of the closest (occlusion predicate —
    the winner id is then query-order dependent, only hit-ness is
    specified).
    """

    rt = r_tile if r_tile is not None else getattr(sweep, "r_tile", R_TILE)

    def select(o, d, v0, e1, e2, eps, cull, tri_mask=None,
               t_max=None, any_hit=False):
        r_tile = rt
        interp = interpret
        if interp is None:
            interp = jax.default_backend() != "tpu"
        r = o.shape[0]
        ids = sweep.tri_ids
        if tri_mask is None:
            mask = (ids >= 0).astype(jnp.int32)
        else:
            mask = (tri_mask[jnp.maximum(ids, 0)] & (ids >= 0)
                    ).astype(jnp.int32)
        rp = -(-r // r_tile) * r_tile
        o32 = o.astype(jnp.float32)
        d32 = d.astype(jnp.float32)
        if t_max is None:
            tm = jnp.full((rp, 1), BIG, jnp.float32)
        else:
            tm = jnp.pad(t_max.astype(jnp.float32).reshape(-1, 1),
                         ((0, rp - r), (0, 0)))
        if rp != r:
            o32 = jnp.pad(o32, ((0, rp - r), (0, 0)))
            d32 = jnp.pad(d32, ((0, rp - r), (0, 0)), constant_values=1.0)
        resident = sweep.tri_soa.size * 4 <= RESIDENT_MAX_BYTES
        call = _sweep_call_resident if resident else _sweep_call
        idx, hit = call(o32, d32, tm, sweep.tri_soa, sweep.aabb,
                        ids, mask, float(eps), bool(cull),
                        any_hit=bool(any_hit), r_tile=r_tile,
                        interpret=bool(interp))
        return idx[:r], hit[:r].astype(bool)

    return select
