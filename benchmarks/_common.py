"""Shared benchmark bootstrap: repo path + persistent compile cache.

Every benchmark script needs the same two things before touching JAX:
the repo root on sys.path (scripts are invoked as files, so only
``benchmarks/`` is auto-added) and the persistent compilation cache
(remote 1080p compiles through the TPU tunnel take minutes; the cache
makes repeat runs start in seconds).  Import this FIRST:

    import _common  # noqa: F401  (side effects: sys.path + jax cache)

or call :func:`enable_compile_cache` explicitly after importing jax.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def enable_compile_cache(min_compile_secs: float = 5.0) -> str:
    """Point JAX at the repo's persistent compile cache (best-effort)."""
    import jax
    cache_dir = os.environ.get("VAUDIO_JAX_CACHE",
                               os.path.join(REPO, ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return cache_dir


enable_compile_cache()
