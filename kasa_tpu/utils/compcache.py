"""Persistent XLA compilation cache.

The reference binary pays zero warmup: identify mmaps the index and
starts scanning (Compare.hpp:182-276).  Our XLA programs compile in
20-40 s each over the tunnel, which round 4 measured as the dominant
cold-start cost (BENCH_r04: 138 s tables+compile+warm).  JAX ships a
persistent compilation cache; enabling it turns every repeat run's
compile into a disk read.

Called by the CLI, bench.py and the profiling tools before the first
dispatch.  KASA_COMPILE_CACHE overrides the directory; set it to "0",
"off" or "none" to disable.
"""

from __future__ import annotations

import os

_ENABLED: list = []


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compile cache at a durable directory.

    Returns the directory in use (None when disabled or unavailable).
    Safe to call repeatedly and before/after jax initialises."""
    env = os.environ.get("KASA_COMPILE_CACHE")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    if _ENABLED:
        return _ENABLED[0]
    d = cache_dir or env or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "kasa_tpu_xla")
    try:
        os.makedirs(d, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every program: the turbo kernel family is a handful of
        # executables and the tunnel makes even 1-2 s compiles worth
        # persisting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except AttributeError:
            pass
    except Exception:
        return None
    _ENABLED.append(d)
    return d
