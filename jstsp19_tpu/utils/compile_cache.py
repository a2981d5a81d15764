"""Persistent-compilation-cache setup (shared by every benchmark entry).

The tunneled TPU backend's remote-compile path is intermittently very
slow; caching compiled executables on disk makes repeat runs immune.
``JSTSP19_NO_CACHE=1`` opts out (used by the CPU dryrun subprocess:
reloading XLA:CPU AOT executables across machines spams machine-feature
warnings and tiny-shape CPU compiles don't need a cache).
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``<repo>/.jax_cache``
    (or ``cache_dir``).  Returns the directory, or None when disabled via
    ``JSTSP19_NO_CACHE``.  Must run before the first compilation."""
    if os.environ.get("JSTSP19_NO_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
