"""Persistent XLA compilation cache: first compile of each program shape is
slow (remote compile on this TPU setup); subsequent processes reuse the
on-disk executable."""
from __future__ import annotations

import os


def enable_persistent_cache(path: str = ".jax_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
