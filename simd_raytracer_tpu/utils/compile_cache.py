"""Repo-local persistent XLA compilation cache (CLAUDE.md quirks #4/#7).

Fresh compiles of heavy configs take minutes on the tunneled TPU, and a
client killed mid-compile wedges the tunnel; the persistent cache makes
any previously-compiled config reload in seconds, so reruns (including
the driver's timed bench) skip the compile entirely.  Verified working
against the axon TPU backend (bench.py round 5).

Call enable() before the first compilation.  The axon sitecustomize
imports jax at interpreter start, so env vars set after startup do not
latch (quirk #3) — the live jax.config.update path is used instead.
The library itself stays side-effect-free: only entry points (CLI,
bench.py, scripts/) opt in.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable(cache_dir: str | None = None) -> str:
    import jax
    d = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(_REPO_ROOT, ".jax_cache"))
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return d
