"""Block-sparse Pallas sweep: closest hit via AABB-culled slice packets.

Each 128/256-triangle slice (accel/sweep.py) is a VPU-shaped SoA packet
with a tight AABB; ray tiles stream past the slices and skip the packet
Moller-Trumbore for (ray-tile, slice) pairs that cannot intersect — the
attention-style block-sparsity trick applied to ray tracing.  This is
the performance-bearing rebuild of the reference's namesake kernel: the
same 9-lane-vector packet intersect + running-winner merge as
kd_tree_simd.hpp:26-60/:266-302, with the kd *traversal* replaced by
dense streaming + culling (SURVEY.md §7: "brute-force Pallas over all
triangles may beat traversal — measure"; this keeps the stream but skips
the dead blocks).

Culling happens OUTSIDE the kernel: a conservative (ray-tile, slice)
reach matrix is computed on the XLA side with interval arithmetic over
each tile's origin/direction bounding boxes, and the kernel reads one
int per (tile, slice) from SMEM to gate the packet test.  Per-ray slab
tests inside the kernel would run on (R, 3)/(R, 1) column layouts that
use 1-3 of the VPU's 128 lanes — measured ~2x slower than brute force
at reference scene sizes; the SMEM gate makes a culled pair cost one
scalar read + branch, so background tiles are nearly free.

Per-ray running winners (best_t, best id) live in VMEM scratch across
the slice dimension; ties resolve to the lowest global triangle id, so
results are identical to every other backend (dropping the per-ray slab
test cannot change winners: any accepted Moller-Trumbore hit lies
inside its slice's AABB, and the min-merge discards hits beyond the
current best anyway).
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


def _tile_reach(o, d, tmax, aabb, r_tile: int):
    """Conservative (tiles, slices) reach matrix -> (reach i32, t_near f32).

    A slice is reachable from a tile unless interval arithmetic over the
    tile's origin box x direction box PROVES no ray can enter the slice
    AABB within [0, max over tile of t_max].  Direction intervals that
    span zero constrain nothing on that axis (their 1/d interval is the
    whole line), so the test degrades gracefully for incoherent tiles —
    it only ever over-approximates, never culls a genuine hit.

    t_near is the per-(tile, slice) LOWER bound on any ray's entry
    distance into the slice box (0 where unconstrained) — the sort key
    for the kernel's front-to-back sweep and the proof obligation for
    its early exit (t_hit >= t_entry >= t_near, so a slice with
    t_near > best_t for every ray cannot improve any winner).
    """
    p = o.shape[0] // r_tile
    o_t = o.reshape(p, r_tile, 3)
    d_t = d.reshape(p, r_tile, 3)
    o_lo, o_hi = o_t.min(axis=1), o_t.max(axis=1)          # (P, 3)
    d_lo, d_hi = d_t.min(axis=1), d_t.max(axis=1)
    tcap = tmax.reshape(p, r_tile).max(axis=1)             # (P,)
    bmin, bmax = aabb[:, 0:3], aabb[:, 3:6]                # (S, 3)
    box_valid = jnp.all(bmax >= bmin, axis=1)              # (S,)

    # 1/d over a sign-uniform interval is [1/d_hi, 1/d_lo]; clamp the
    # near-zero blowup to +-BIG so 0 * inf never makes a NaN below
    # (NaN would compare False and cull a reachable slice).
    uniform = (d_lo > 0.0) | (d_hi < 0.0)                  # (P, 3)
    inv_lo = jnp.clip(1.0 / jnp.where(uniform, d_hi, 1.0), -BIG, BIG)
    inv_hi = jnp.clip(1.0 / jnp.where(uniform, d_lo, 1.0), -BIG, BIG)

    # numerator intervals per (tile, slice, axis)
    na_lo = bmin[None] - o_hi[:, None]                     # (P, S, 3)
    na_hi = bmin[None] - o_lo[:, None]
    nb_lo = bmax[None] - o_hi[:, None]
    nb_hi = bmax[None] - o_lo[:, None]

    def prod_bounds(n_lo, n_hi, i_lo, i_hi):
        p1, p2 = n_lo * i_lo, n_lo * i_hi
        p3, p4 = n_hi * i_lo, n_hi * i_hi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    il, ih = inv_lo[:, None, :], inv_hi[:, None, :]
    ta_lo, ta_hi = prod_bounds(na_lo, na_hi, il, ih)
    tb_lo, tb_hi = prod_bounds(nb_lo, nb_hi, il, ih)
    # near = min(tA, tB) pointwise (whichever plane the ray enters
    # first), so its lower bound is min of the lower bounds; dually far.
    near_lo = jnp.minimum(ta_lo, tb_lo)
    far_hi = jnp.maximum(ta_hi, tb_hi)
    unb = ~uniform[:, None, :]
    near_lo = jnp.where(unb, -BIG, near_lo)
    far_hi = jnp.where(unb, BIG, far_hi)
    t_near = jnp.maximum(jnp.max(near_lo, axis=2), 0.0)    # (P, S)
    t_far = jnp.min(far_hi, axis=2)
    reach = (t_far >= t_near) & (t_near <= tcap[:, None])
    reach &= box_valid[None, :]
    return reach.astype(jnp.int32), t_near


def _tile_schedule(reach, t_near):
    """Per-tile compacted front-to-back slice schedule.

    From the (P, S) reach mask + entry lower bounds, build
      count  (P, 1) i32   reachable slices per tile
      order  (P, S) i32   slice ids, reachable first, ascending t_near
      tnear  (P, S) f32   t_near in that order (BIG past count)
    The kernel loops j in [0, count) over order[j] and STOPS at the
    first j whose tnear strictly exceeds every ray's current best —
    later slices have even larger entry bounds (sorted), so no skipped
    slice can contain a winner; ties (==) keep going, preserving the
    lowest-gid tie-break.
    """
    # inf sentinel, NOT BIG: a reachable slice can legitimately carry
    # t_near == BIG (tcap == BIG with a saturated 1/d interval) and must
    # sort strictly before every unreachable entry.
    key = jnp.where(reach > 0, t_near, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    tnear_sorted = jnp.take_along_axis(key, order, axis=1)
    count = jnp.sum(reach > 0, axis=1, dtype=jnp.int32)[:, None]
    return count, order, tnear_sorted


def _mt_merge(o, d, tri, gid, mask, best_t, best_i, *, eps, cull, any_hit):
    """Classic packet Moller-Trumbore of (R,) rays x (T,) lanes, merged
    into the running (best_t, best_i).  Math identical to mt_pairs
    (ops/intersect.py) so winners are bitwise equal to brute force."""
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]           # (R, 1)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    v0x, v0y, v0z = tri[0:1, :], tri[1:2, :], tri[2:3, :]  # (1, T)
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

    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u_num = tvx * px + tvy * py + tvz * pz
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v_num = dx * qx + dy * qy + dz * qz
    t_num = e2x * qx + e2y * qy + e2z * qz

    if any_hit:
        # Occlusion predicate: division-free accepts on the numerators
        # (u in [0,1] <=> 0 <= u_num*s <= |det|, etc. — same algebra as
        # mt_select_fast) and ONE any-reduce instead of the min/tie
        # merge.  The inclusive t <= t_max window tests against best_t,
        # which any_hit keeps parked at the ray's original t_max until
        # the ray decides (then -1, making every later test false).
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        adet = det * s
        us = u_num * s
        vs = v_num * s
        ts = t_num * s
        ok &= (us >= 0.0) & (us <= adet)
        ok &= (vs >= 0.0) & (us + vs <= adet)
        ok &= ts > eps * adet
        ok &= ts <= best_t * adet                          # (R,1)*(R,T)
        ok &= mask > 0
        dec = jnp.any(ok, axis=1, keepdims=True) & (best_i == IMAX)
        new_t = jnp.where(dec, -1.0, best_t)
        new_i = jnp.where(dec, 0, best_i)
        return new_t, new_i

    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    u = u_num * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    v = v_num * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = t_num * inv_det
    ok &= t > eps
    ok &= mask > 0                                         # (1, T)

    t_m = jnp.where(ok, t, BIG)
    blk_t = jnp.min(t_m, axis=1, keepdims=True)
    blk_i = jnp.min(jnp.where(t_m == blk_t, gid, IMAX),
                    axis=1, keepdims=True)
    # blk_t == BIG rows (no accepted lane) tie-match every lane in the
    # where() above, so blk_i is a bogus min(gid) there — gate the whole
    # update on a real candidate t.  best_t seeded with t_max makes the
    # window INCLUSIVE (t == t_max ties the seed and wins on blk_i <
    # IMAX), matching the reference's t <= max_t (render.hpp:121).
    upd = ((blk_t < best_t)
           | ((blk_t == best_t) & (blk_i < best_i))) & (blk_t < BIG)
    new_t = jnp.where(upd, blk_t, best_t)
    new_i = jnp.where(upd, blk_i, best_i)
    return new_t, new_i


def _kernel(count_ref, order_ref, tnear_ref, o_ref, d_ref, tmax_ref,
            tri_ref, ids_ref, mask_ref, idx_out, hit_out, best_t, best_i,
            *, eps: float, cull: bool, any_hit: bool):
    """Streaming variant: grid = (ray tiles, slice STEPS); step j DMAs
    the j-th slice of THIS TILE'S front-to-back schedule (the tri/ids/
    mask index_maps read order_ref — scalar-prefetch dynamic block
    indexing), running winners in scratch across the step dim.  Steps
    past count, or whose slice's conservative entry bound already
    exceeds every ray's best t, skip the packet test; unlike the
    resident variant the grid itself cannot stop early, so a pruned
    step still costs its (tiny, ~9 KB) slice DMA but no compute."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_t[:] = tmax_ref[:]
        best_i[:] = jnp.full_like(best_i, IMAX)

    @pl.when((j < count_ref[i, 0])
             & (tnear_ref[i, j] <= jnp.max(best_t[:])))
    def _():
        best_t[:], best_i[:] = _mt_merge(
            o_ref[:], d_ref[:], tri_ref[0], ids_ref[0], mask_ref[0],
            best_t[:], best_i[:], eps=eps, cull=cull, any_hit=any_hit)

    @pl.when(j == ns - 1)
    def _():
        won = best_i[:] != IMAX
        idx_out[:] = jnp.where(won, best_i[:], 0)
        hit_out[:] = won.astype(jnp.int32)


def _kernel_resident(count_ref, order_ref, tnear_ref, o_ref, d_ref,
                     tmax_ref, tri_ref, ids_ref, mask_ref, idx_out,
                     hit_out, *, eps: float, cull: bool, any_hit: bool):
    """Scene-resident variant: grid = ray tiles ONLY; the whole sliced
    triangle soup lives in VMEM (a reference-scale scene is ~150 KB) and
    the slice sweep is an in-kernel while_loop over THIS TILE'S
    compacted front-to-back schedule (count/order/tnear in SMEM, built
    by _tile_schedule):

      * culled slices cost zero iterations (they sit past count),
      * the loop BREAKS once the next slice's conservative entry bound
        exceeds every ray's current best t — the tile-granular analog
        of the reference kd traversal's `best_t < box.t_min` prune
        (kd_tree_simd.hpp:199-205).  With any_hit, decided rays park
        best_t at -1, so a fully decided tile exits the same way.
    """
    i = pl.program_id(0)
    o = o_ref[:]                      # (R, 3)
    d = d_ref[:]
    r = o.shape[0]
    cnt = count_ref[i, 0]

    def cond(carry):
        j, best_t, _ = carry
        # clamped read: & does not short-circuit, so j == cnt == S must
        # still index in bounds (the j < cnt term already kills it)
        jc = jnp.minimum(j, tnear_ref.shape[1] - 1)
        return (j < cnt) & (tnear_ref[i, jc] <= jnp.max(best_t))

    def body(carry):
        j, best_t, best_i = carry
        s = order_ref[i, j]
        best_t, best_i = _mt_merge(o, d, tri_ref[s], ids_ref[s],
                                   mask_ref[s], best_t, best_i, eps=eps,
                                   cull=cull, any_hit=any_hit)
        return j + 1, best_t, best_i

    init = (jnp.int32(0),
            jnp.broadcast_to(tmax_ref[:], (r, 1)),
            jnp.full((r, 1), IMAX, jnp.int32))
    _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    won = best_i != IMAX
    idx_out[:] = jnp.where(won, best_i, 0)
    hit_out[:] = won.astype(jnp.int32)


# Scenes whose sliced soup fits comfortably resident in VMEM use the
# in-kernel slice loop; bigger scenes stream slices via the grid.
RESIDENT_MAX_BYTES = 6 << 20


@functools.partial(jax.jit,
                   static_argnames=("eps", "cull", "any_hit", "r_tile",
                                    "interpret"))
def _sweep_call_resident(o, d, tmax, count, order, tnear, tri_soa, ids,
                         mask, eps: float, cull: bool,
                         any_hit: bool = False, r_tile: int = R_TILE,
                         interpret: bool = False):
    r = o.shape[0]
    s = tri_soa.shape[0]
    t = tri_soa.shape[2]
    kern = functools.partial(_kernel_resident, eps=eps, cull=cull,
                             any_hit=any_hit)
    idx, hit = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(pl.cdiv(r, r_tile),),
            in_specs=[
                pl.BlockSpec((r_tile, 3), lambda i, *_: (i, 0)),
                pl.BlockSpec((r_tile, 3), lambda i, *_: (i, 0)),
                pl.BlockSpec((r_tile, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((s, 9, t), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((s, 1, t), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((s, 1, t), lambda i, *_: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((r_tile, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((r_tile, 1), lambda i, *_: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(count, order, tnear, o, d, tmax, tri_soa,
      ids[:, None, :], mask[:, None, :])
    return idx[:, 0], hit[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("eps", "cull", "any_hit", "r_tile",
                                    "interpret"))
def _sweep_call(o, d, tmax, count, order, tnear, tri_soa, ids, mask,
                eps: float, cull: bool, any_hit: bool = False,
                r_tile: int = R_TILE, interpret: bool = False):
    R_TILE = r_tile
    r = o.shape[0]
    s = tri_soa.shape[0]
    t = tri_soa.shape[2]
    grid = (pl.cdiv(r, R_TILE), s)
    kern = functools.partial(_kernel, eps=eps, cull=cull, any_hit=any_hit)

    def slice_at(i, j, count, order, tnear):
        return (order[i, j], 0, 0)

    idx, hit = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R_TILE, 3), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((R_TILE, 3), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((R_TILE, 1), lambda i, j, *_: (i, 0)),
                # 3-D (S, 1, x) layouts: Mosaic wants the last two block
                # dims divisible by (8, 128) or equal to the array dims;
                # (1, x) blocks of a 2-D (S, x) array violate the
                # sublane rule.
                pl.BlockSpec((1, 9, t), slice_at),
                pl.BlockSpec((1, 1, t), slice_at),
                pl.BlockSpec((1, 1, t), slice_at),
            ],
            out_specs=[
                pl.BlockSpec((R_TILE, 1), lambda i, j, *_: (i, 0)),
                pl.BlockSpec((R_TILE, 1), lambda i, j, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((R_TILE, 1), jnp.float32),
                pltpu.VMEM((R_TILE, 1), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(count, order, tnear, o, d, tmax, tri_soa,
      ids[:, None, :], mask[:, None, :])
    return idx[:, 0], hit[:, 0]


def make_sweep_select(sweep, interpret: Optional[bool] = None,
                      r_tile: Optional[int] = None):
    """Bind SweepData into the common select signature
    (o, d, v0, e1, e2, eps, cull, tri_mask) -> (idx, hit).

    v0/e1/e2 are ignored — slice geometry was packed at build time
    (select is stop-gradiented; the differentiable refine re-derives the
    winner's t/u/v from live vertices, ops/intersect.py).

    Extra (sweep-only) kwargs: t_max (N,) accepts hits with t <= t_max
    (inclusive, like the reference's `t <= max_t`) and culls the slices
    past it; any_hit=True returns the first accepted hit inside the
    window instead of the closest (occlusion predicate — the winner id
    is then query-order dependent, only hit-ness is specified).
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
            tm = jnp.full((r, 1), BIG, jnp.float32)
        else:
            tm = t_max.astype(jnp.float32).reshape(-1, 1)
        # Padded rays get t_max = 0 (not BIG): they seed best_t at 0, so
        # they can never dominate jnp.max(best_t) and block the final
        # partial tile's front-to-back early exit.
        tm = jnp.pad(tm, ((0, rp - r), (0, 0)))
        if rp != r:
            o32 = jnp.pad(o32, ((0, rp - r), (0, 0)))
            d32 = jnp.pad(d32, ((0, rp - r), (0, 0)), constant_values=1.0)
        reach, t_near = _tile_reach(o32, d32, tm[:, 0], sweep.aabb,
                                    r_tile)
        # Budget everything the resident kernel pins in VMEM: tri_soa
        # (S,9,T) plus ids + mask ((S,T) i32 each -> 11/9 of tri_soa);
        # the ray tiles are small by comparison.
        resident_bytes = (sweep.tri_soa.size * 4 * 11) // 9
        resident = resident_bytes <= RESIDENT_MAX_BYTES
        count, order, tnear = _tile_schedule(reach, t_near)
        call = _sweep_call_resident if resident else _sweep_call
        idx, hit = call(o32, d32, tm, count, order, tnear, sweep.tri_soa,
                        ids, mask, float(eps), bool(cull),
                        any_hit=bool(any_hit), r_tile=r_tile,
                        interpret=bool(interp))
        return idx[:r], hit[:r].astype(bool)

    return select
