"""Persistent XLA compilation cache: first compile of each program shape is
slow (remote compile on this TPU setup); subsequent processes reuse the
on-disk executable."""
from __future__ import annotations

import hashlib
import os


def _host_tag() -> str:
    """Fingerprint the host microarchitecture.

    XLA:CPU caches AOT executables specialized to the compile machine's
    feature set; reusing them on a different host warns ("could lead to
    execution errors such as SIGILL") and has been observed to segfault in
    ``put_executable_and_time``.  Partitioning the cache directory by CPU
    flags makes a foreign host start a fresh cache instead of loading (or
    appending to) incompatible entries.  TPU executables are
    target-versioned by XLA itself, but they live under the same dir, so
    the tag keys on the host CPU only.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # non-Linux: fall back to the platform string
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_persistent_cache(path: str = ".jax_cache"):
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        # XLA:CPU executable serialization (executable.serialize() inside
        # put_executable_and_time) has segfaulted twice on this host
        # mid-test-run — CPU AOT results are machine-feature-specialized
        # and their serialization path is not robust.  The cache's big win
        # is the TPU path (remote compiles); CPU just recompiles.
        return
    path = os.path.join(path, _host_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
