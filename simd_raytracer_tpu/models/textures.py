"""Texture sampling: tag-dispatched, fully vectorized, differentiable.

The reference dispatches a std::visit over four texture variants
(reference: include/raytracer/scene/texture/texture.hpp:10-11 and
queries.hpp:7-11).  Here every wavefront ray computes all four samplers on
gathered per-ray texture parameters and selects by tag — branchless, the
idiomatic XLA replacement for variant dispatch.

Samplers (semantics per reference file):
  * albedo  — constant color (texture/albedo.hpp:8-14)
  * edges   — barycentric u/v/w < edge_width -> edge color
              (texture/edge.hpp:8-23)
  * checker — interpolated UV, truncated (u/sq + v/sq) parity with C++
              truncated division/remainder (texture/checker.hpp:7-27)
  * bitmap  — nearest-neighbor atlas lookup with v-flip and clamp
              (texture/bitmap.hpp:46-60)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scene import (TEX_ALBEDO, TEX_BITMAP, TEX_CHECKER, TEX_EDGES, Scene)


def sample_texture(scene: Scene, tex_id: jnp.ndarray,
                   u: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray,
                   uvs: jnp.ndarray) -> jnp.ndarray:
    """Sample per-ray textures.

    tex_id (N,) i32; u,v,w (N,) barycentrics; uvs (N,3,2) corner UVs.
    Returns (N,3) colors.
    """
    tag = scene.tex_tag[tex_id]
    color_a = scene.tex_color_a[tex_id]
    color_b = scene.tex_color_b[tex_id]
    param = scene.tex_param[tex_id]

    # Interpolated UV: w*uv0 + u*uv1 + v*uv2 (checker.hpp:17, bitmap.hpp:51).
    fu = w * uvs[:, 0, 0] + u * uvs[:, 1, 0] + v * uvs[:, 2, 0]
    fv = w * uvs[:, 0, 1] + u * uvs[:, 1, 1] + v * uvs[:, 2, 1]

    # edges (edge.hpp:18-22)
    edge = (u < param) | (v < param) | (w < param)
    edge_color = jnp.where(edge[:, None], color_a, color_b)

    # checker (checker.hpp:20-26): C++ float->int32 casts truncate toward
    # zero, and % is the truncated remainder — lax.rem matches C++ %.
    safe_sq = jnp.maximum(param, 1e-20)
    u2 = (fu / safe_sq).astype(jnp.int32)
    v2 = (fv / safe_sq).astype(jnp.int32)
    checker_even = jax.lax.rem(u2 + v2, jnp.int32(2)) == 0
    checker_color = jnp.where(checker_even[:, None], color_a, color_b)

    # bitmap (bitmap.hpp:52-59): row = size_t((1-v)*H), col = size_t(u*W),
    # clamped to valid range; nearest-neighbor gather from the flat atlas.
    th = scene.tex_height[tex_id]
    tw = scene.tex_width[tex_id]
    row = jnp.clip(((1.0 - fv) * th.astype(jnp.float32)).astype(jnp.int32),
                   0, th - 1)
    col = jnp.clip((fu * tw.astype(jnp.float32)).astype(jnp.int32),
                   0, tw - 1)
    flat = scene.tex_offset[tex_id] + row * tw + col
    flat = jnp.clip(flat, 0, scene.atlas.shape[0] - 1)
    bitmap_color = scene.atlas[flat]

    out = color_a  # TEX_ALBEDO default
    out = jnp.where((tag == TEX_EDGES)[:, None], edge_color, out)
    out = jnp.where((tag == TEX_CHECKER)[:, None], checker_color, out)
    out = jnp.where((tag == TEX_BITMAP)[:, None], bitmap_color, out)
    return out
