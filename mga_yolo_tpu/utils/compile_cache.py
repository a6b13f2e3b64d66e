"""Persistent XLA compile cache, shared by every entry point.

Big graphs are slow to compile (minutes on a remote-compile TPU tunnel,
~8 min for the eval program on this sandbox's 1-core CPU); the persistent
cache loads them back in seconds. Override the location with
``MGA_JAX_CACHE``.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache() -> None:
    import jax

    cache_dir = os.environ.get("MGA_JAX_CACHE", str(Path.home() / ".cache" / "mga_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
