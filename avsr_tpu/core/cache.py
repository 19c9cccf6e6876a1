"""Persistent XLA compilation cache setup.

First compiles through the hosted TPU tunnel are slow (minutes for the
flagship graphs); the persistent cache makes every subsequent process start
near-instant. Call early, before building any jitted computation.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "jax")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("AVSR_JAX_CACHE", DEFAULT_CACHE_DIR)
    if path in ("off", "0", "none"):
        # AVSR_JAX_CACHE=off: leave the persistent cache disabled. The CPU
        # test suite sets this (tests/conftest.py): the cache's executable
        # serialization has twice segfaulted the suite mid-write
        # (compilation_cache.put_executable_and_time, jax 0.9.0), and CPU
        # compiles gain little from persistence anyway.
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception:
            pass
        return
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
