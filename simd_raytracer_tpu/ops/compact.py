"""Wavefront compaction primitives shared by render and shade.

The reference gets sparsity for free from recursion (dead paths simply
return, render.hpp:133-139); the flat TPU wavefront recovers it by
gathering live rays to the front and running narrower compiled widths.
The permutation here is the cost that must stay negligible at every
width the wavefront reaches.
"""

from __future__ import annotations

import jax.numpy as jnp


def scatter_rows(n: int, idx: jnp.ndarray, vals: jnp.ndarray,
                 fills=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """(len(idx), C) vals scattered to row idx of an (n, C) buffer whose
    column c is pre-filled with fills[c].

    One 1-D scatter per column: an XLA:TPU scatter of (rows, 3) slices
    lowers ~9x slower than three column scatters + a stack (measured
    0.66 ms vs 0.075 ms for 16k rows into 512k at r5) — the row form
    serializes per row while the column form vectorizes.
    """
    cols = [jnp.full((n,), fills[c], vals.dtype).at[idx].set(vals[:, c])
            for c in range(vals.shape[1])]
    return jnp.stack(cols, axis=1)


def alive_first_order(mask: jnp.ndarray) -> jnp.ndarray:
    """Stable alive-first permutation of [0, n): mask=True rows first,
    original order preserved within each class.

    Identical to jnp.argsort(~mask, stable=True) but built from two
    cumsums and one scatter — O(n) instead of a bitonic sort network,
    which measured as a real cost at split-mode widths (r0 * 2^depth
    slots by depth 5) and runs once per bounce, shadow tier, and march
    tier.
    """
    n = mask.shape[0]
    m = mask.astype(jnp.int32)
    rank_alive = jnp.cumsum(m) - 1                 # rank among alive
    rank_dead = jnp.cumsum(1 - m) - 1              # rank among dead
    n_alive = rank_alive[-1] + 1
    pos = jnp.where(mask, rank_alive, n_alive + rank_dead)
    return (jnp.zeros(n, jnp.int32)
            .at[pos].set(jnp.arange(n, dtype=jnp.int32)))
