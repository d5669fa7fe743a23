"""Closest-hit selection on the MXU: Moller-Trumbore as bilinear matmuls.

The TPU's FLOPs live in the 128x128 systolic array, not the VPU — but
ray-triangle intersection looks elementwise.  The trick: every
Moller-Trumbore numerator is a *scalar triple product*, which is bilinear
in (ray features) x (triangle features).  With the ray feature vector

    f = [o, d, c, 1]          where  c = o x d        (10 features)

and per-triangle constant vectors derived from (v0, e1, e2):

    n = e1 x e2                                       (unnormalized normal)
    det   = e1 . (d x e2)            = f . [ 0,  -n,      0,   0      ]
    t_num = e2 . ((o - v0) x e1)     = f . [ n,   0,      0,  -(v0.n) ]
    u_num = (o - v0) . (d x e2)      = f . [ 0,  v0 x e2, e2,  0      ]
    v_num = d . ((o - v0) x e1)      = f . [ 0,  e1 x v0, -e1, 0      ]

(by multilinearity of det3 and the cyclic identity a.(b x c) = c.(a x b)),
so ALL pairs reduce to four (R, 10) @ (10, T) matmuls — the exact math of
triangle_packet::intersect (reference: render/accel/kd_tree_simd.hpp:26-60)
with the 9 per-lane cross/dot products hoisted into the contraction.  The
accept tests become division-free sign comparisons on the numerators:

    u in [0, 1]   <=>  u_num * sign(det) in [0, |det|]
    v >= 0, u+v<=1 <=> v_num * s >= 0  and  (u_num + v_num) * s <= |det|
    t > eps        <=>  t_num * s > eps * |det|

Division happens once, for t of accepted pairs, before the min-reduce.
Matmuls run with Precision.HIGHEST (bf16x6 passes, ~f32 accurate); the
winner's exact t/u/v are recomputed differentiably by ops.intersect.refine
anyway, so sub-ulp winner flips only matter at exact ties.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.4e38)
IMAX = jnp.int32(2**31 - 1)

RAY_BLOCK = 8192   # rays per matmul block: bounds the (B, T) intermediates


def _tri_weights(v0, e1, e2):
    """Per-triangle weight matrices, each (T, 10): det/t/u/v numerators."""
    t = v0.shape[0]
    z3 = jnp.zeros((t, 3), v0.dtype)
    z1 = jnp.zeros((t, 1), v0.dtype)
    n = jnp.cross(e1, e2)
    w_det = jnp.concatenate([z3, -n, z3, z1], axis=1)
    w_t = jnp.concatenate(
        [n, z3, z3, -jnp.sum(v0 * n, axis=1, keepdims=True)], axis=1)
    w_u = jnp.concatenate([z3, jnp.cross(v0, e2), e2, z1], axis=1)
    w_v = jnp.concatenate([z3, jnp.cross(e1, v0), -e1, z1], axis=1)
    return w_det, w_t, w_u, w_v


def _ray_features(o, d):
    ones = jnp.ones((o.shape[0], 1), o.dtype)
    return jnp.concatenate([o, d, jnp.cross(o, d), ones], axis=1)  # (R, 10)


def mt_select_fast(
    o: jnp.ndarray,            # (R, 3)
    d: jnp.ndarray,            # (R, 3)
    v0: jnp.ndarray,           # (T, 3)
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    eps: float,
    cull: bool,
    tri_mask: Optional[jnp.ndarray] = None,
    t_max: Optional[jnp.ndarray] = None,      # (R,) inclusive t window
    any_hit: bool = False,
):
    """Pure-VPU bilinear select: the same triple-product factorization as
    the MXU path but as broadcast elementwise ops — ~33 ops/pair vs ~55
    for classic Moller-Trumbore, no matmul intermediates.

    The optional t_max window stays DIVISION-FREE: t <= t_max with
    adet > 0 is t_num * s <= t_max * adet.  With any_hit=True (the
    occlusion predicate, render.hpp:110-131) the (R, T) division, the
    argmin and the min-reduce all disappear — the reduction is one
    `any` over the accept mask.

    Numerically it differs from the classic formulation in the last ulps
    (the tvec subtraction is distributed over the products), so exact-tie
    winners at shared triangle edges can flip; the differentiable refine
    recomputes the winner's exact t/u/v either way.  Division-free accept
    tests; one division for the min-reduce key.

    The o x d triple products cancel at a scale ~|o| x |scene extent|, so
    rays and triangles are re-centered on the triangle centroid first —
    the factorization is translation-invariant, and centering keeps the
    near-tie flips at reference-scene scale regardless of where the scene
    sits in world space.
    """
    center = jnp.mean(v0, axis=0)                 # (3,) cheap, T ops
    o = o - center[None, :]
    v0 = v0 - center[None, :]
    n = jnp.cross(e1, e2)                         # (T, 3)
    v0n = jnp.sum(v0 * n, axis=1)                 # (T,)
    wu = jnp.cross(v0, e2)                        # d-coefficient of u_num
    wv = jnp.cross(e1, v0)                        # d-coefficient of v_num
    c = jnp.cross(o, d)                           # (R, 3) once per ray

    def row(a, k):          # (T,) -> (1, T)
        return a[None, :, k] if a.ndim == 2 else a[None, :]

    def col(a, k):          # (R,) -> (R, 1)
        return a[:, k:k + 1]

    det = -(col(d, 0) * row(n, 0) + col(d, 1) * row(n, 1)
            + col(d, 2) * row(n, 2))
    t_num = (col(o, 0) * row(n, 0) + col(o, 1) * row(n, 1)
             + col(o, 2) * row(n, 2)) - v0n[None, :]
    u_num = (col(c, 0) * row(e2, 0) + col(c, 1) * row(e2, 1)
             + col(c, 2) * row(e2, 2)
             + col(d, 0) * row(wu, 0) + col(d, 1) * row(wu, 1)
             + col(d, 2) * row(wu, 2))
    v_num = (col(d, 0) * row(wv, 0) + col(d, 1) * row(wv, 1)
             + col(d, 2) * row(wv, 2)
             - (col(c, 0) * row(e1, 0) + col(c, 1) * row(e1, 1)
                + col(c, 2) * row(e1, 2)))

    s = jnp.where(det >= 0.0, 1.0, -1.0).astype(o.dtype)
    adet = det * s
    if cull:
        ok = det > eps
    else:
        ok = adet > eps
    us = u_num * s
    vs = v_num * s
    ok &= (us >= 0.0) & (us <= adet)
    ok &= (vs >= 0.0) & (us + vs <= adet)
    ok &= t_num * s > eps * adet
    if tri_mask is not None:
        ok &= tri_mask[None, :]
    if t_max is not None:
        ok &= t_num * s <= t_max[:, None] * adet
    if any_hit:
        return (jnp.zeros(o.shape[0], jnp.int32), jnp.any(ok, axis=1))

    t_val = t_num / jnp.where(ok, det, 1.0)
    t_m = jnp.where(ok, t_val, BIG)
    best_idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)
    best_t = jnp.min(t_m, axis=1)
    return best_idx, best_t < BIG


def mt_select_mxu(
    o: jnp.ndarray,            # (R, 3)
    d: jnp.ndarray,            # (R, 3)
    v0: jnp.ndarray,           # (T, 3)
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    eps: float,
    cull: bool,
    tri_mask: Optional[jnp.ndarray] = None,
    t_max: Optional[jnp.ndarray] = None,      # (R,) inclusive t window
    any_hit: bool = False,
):
    """Drop-in replacement for ops.intersect.mt_select on the MXU path.

    t_max/any_hit as in mt_select_fast: a division-free inclusive window
    on the numerators, and an any-reduce occlusion predicate."""
    r = o.shape[0]
    t = v0.shape[0]
    dtype = o.dtype

    w_det, w_t, w_u, w_v = _tri_weights(v0, e1, e2)
    # One fused (10, 4T) operand: a single matmul keeps the MXU busy and
    # XLA fuses the slice + accept + reduce consumers.
    w_all = jnp.concatenate([w_det, w_t, w_u, w_v], axis=0).T  # (10, 4T)
    mask = None if tri_mask is None else tri_mask[None, :]
    big = jnp.asarray(BIG, dtype)

    block = min(RAY_BLOCK, max(r, 1))
    r_pad = -(-r // block) * block
    feats = _ray_features(o, d)
    tmax = (jnp.full((r,), BIG, dtype) if t_max is None
            else t_max.astype(dtype))
    if r_pad != r:
        feats = jnp.pad(feats, ((0, r_pad - r), (0, 0)))
        tmax = jnp.pad(tmax, (0, r_pad - r))   # pad window 0: no accepts
    feats = feats.reshape(r_pad // block, block, 10)
    tmax = tmax.reshape(r_pad // block, block)

    def one_block(args):
        f, tm = args
        nums = jax.lax.dot_general(
            f, w_all, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)                    # (B, 4T)
        det = nums[:, 0 * t:1 * t]
        t_num = nums[:, 1 * t:2 * t]
        u_num = nums[:, 2 * t:3 * t]
        v_num = nums[:, 3 * t:4 * t]

        s = jnp.where(det >= 0.0, 1.0, -1.0).astype(dtype)
        adet = det * s
        if cull:
            ok = det > eps
        else:
            ok = adet > eps
        us = u_num * s
        vs = v_num * s
        ok &= (us >= 0.0) & (us <= adet)
        ok &= (vs >= 0.0) & (us + vs <= adet)
        ok &= t_num * s > eps * adet
        if mask is not None:
            ok &= mask
        if t_max is not None:
            ok &= t_num * s <= tm[:, None] * adet
        if any_hit:
            return (jnp.zeros(f.shape[0], jnp.int32),
                    jnp.any(ok, axis=1))
        t_val = t_num / jnp.where(ok, det, 1.0)
        t_m = jnp.where(ok, t_val, big)
        best_idx = jnp.argmin(t_m, axis=1).astype(jnp.int32)
        best_t = jnp.min(t_m, axis=1)
        return best_idx, best_t < big

    idx, hit = jax.lax.map(one_block, (feats, tmax))
    return idx.reshape(-1)[:r], hit.reshape(-1)[:r]
