"""Leaf-sweep acceleration data: kd leaves as dense 128-triangle slices.

The TPU-native answer to divergent tree traversal (SURVEY.md §7 hard part
(a)): instead of per-ray stacks, the spatial structure is flattened into a
STATIC list of triangle slices — each a VPU-shaped (9, 128) SoA packet (the
scaled-up sibling of the reference's width-W triangle_packet,
kd_tree_simd.hpp:16-24) with a tight AABB over its members.  The Pallas
sweep kernel (ops/intersect_sweep.py) streams every slice past every ray
tile and SKIPS the packet Moller-Trumbore for (ray-tile, slice) pairs whose
AABB test culls — block-sparsity instead of pointer chasing, so coherent
rays pay only for the slices they can actually hit while the pipeline
stays dense.

Slices come from a (deeper-than-reference) kd-tree build so they are
spatially tight; duplicated triangles across slices are harmless (winner
merge is by lexicographic (t, global id), same result as brute force).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .build import build_kdtree, triangle_aabbs

SLICE = 128   # triangles per slice = VPU lane width


@struct.dataclass
class SweepData:
    """S slices of slice_size triangles each (static shapes per scene)."""

    tri_soa: jnp.ndarray   # (S, 9, SLICE) f32: v0xyz, e1xyz, e2xyz rows
    aabb: jnp.ndarray      # (S, 8) f32: min xyz, max xyz, 2 pad
    tri_ids: jnp.ndarray   # (S, SLICE) i32 global triangle ids, -1 pad
    # rays per Pallas grid tile (static tuning knob, not traced data)
    r_tile: int = struct.field(pytree_node=False, default=512)

    @property
    def num_slices(self) -> int:
        return int(self.tri_ids.shape[0])


def _morton_order(tri_min: np.ndarray, tri_max: np.ndarray,
                  ids: np.ndarray) -> np.ndarray:
    """Sort triangle ids along a 30-bit Morton curve of their centroids.

    Nearby triangles land in the same 128-slice, which is what makes the
    per-slice AABBs tight enough for block culling — without the
    both-children duplication a kd split incurs (kd_tree_simd.hpp:160-170
    pays it; a disjoint partition never does)."""
    if len(ids) == 0:
        return ids
    c = 0.5 * (tri_min[ids] + tri_max[ids])
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-30)
    q = np.minimum((1023.0 * (c - lo) / span), 1023.0).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))
    return ids[np.argsort(code, kind="stable")]


def build_sweep_for_scene(scene, partition: str = "morton",
                          max_depth: int = 12,
                          max_leaf: int = SLICE,
                          slice_size: int = 256,
                          r_tile: int = 512) -> SweepData:
    """Pack triangles into tight slice_size-triangle slices.

    partition="morton" (default): disjoint slices of consecutive
    triangles along a Morton curve — exactly ceil(T/slice_size) slices,
    zero duplication, so the sweep never tests more lanes than brute
    force and culling is pure profit.  partition="kdleaf": slices from a
    deeper-than-reference kd build (duplication across slices costs
    padded lanes but boxes can be tighter).

    slice_size=256 measured best on v5e (scripts/tune_sweep.py: 256 beats
    both 128, which pays more per-slice overhead, and 512, which culls
    too coarsely); r_tile=512 beats 256 and 1024."""
    vertices = np.asarray(scene.vertices)
    tri_vidx = np.asarray(scene.tri_vidx)
    valid = np.asarray(scene.tri_valid)
    tri_min, tri_max = triangle_aabbs(vertices, tri_vidx)

    slices = []
    if partition == "morton":
        order = _morton_order(tri_min, tri_max,
                              np.flatnonzero(valid).astype(np.int32))
        for s in range(0, len(order), slice_size):
            slices.append(order[s:s + slice_size])
    elif partition == "kdleaf":
        tree = build_kdtree(tri_min, tri_max, valid, max_depth, max_leaf)
        for row in np.asarray(tree.leaf_tris):
            tris = row[row >= 0]
            for s in range(0, len(tris), slice_size):
                slices.append(tris[s:s + slice_size])
    else:
        raise ValueError(partition)
    if not slices:
        slices.append(np.zeros(0, np.int32))

    s_count = len(slices)
    tri_ids = np.full((s_count, slice_size), -1, np.int32)
    tri_soa = np.zeros((s_count, 9, slice_size), np.float32)
    aabb = np.zeros((s_count, 8), np.float32)

    corners = vertices[tri_vidx]                   # (T, 3, 3)
    v0 = corners[:, 0]
    e1 = corners[:, 1] - corners[:, 0]
    e2 = corners[:, 2] - corners[:, 0]
    soa_all = np.concatenate([v0.T, e1.T, e2.T], axis=0)   # (9, T)

    for i, tris in enumerate(slices):
        n = len(tris)
        if n == 0:
            # Empty slice: inverted box (min > max).  NOTE: the slab
            # test's per-axis lo/hi swap would re-validate ANY inverted
            # box, so the kernel culls these with an explicit
            # box-validity check (max >= min), not the slab interval.
            aabb[i, 0:3] = 1.0
            aabb[i, 3:6] = -1.0
            continue
        tri_ids[i, :n] = tris
        tri_soa[i, :, :n] = soa_all[:, tris]
        aabb[i, 0:3] = tri_min[tris].min(axis=0)
        aabb[i, 3:6] = tri_max[tris].max(axis=0)

    return SweepData(tri_soa=jnp.asarray(tri_soa),
                     aabb=jnp.asarray(aabb),
                     tri_ids=jnp.asarray(tri_ids),
                     r_tile=r_tile)
