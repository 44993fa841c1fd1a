"""Persistent XLA compilation cache setup.

On this stack XLA compiles run on a remote service (15 s–5 min per new
computation), so a process that doesn't opt into JAX's persistent cache
re-pays every compile on startup — an `evaluate` of a shape another process
compiled minutes earlier costs minutes instead of seconds. The reference has
no analogue (torch eager mode never compiles; its closest cost is CUDA kernel
JIT, cached process-wide by the driver) — this is pure TPU-stack plumbing.

Called by the CLI entry (``__main__.main``) and ``bench.py`` so every
user-facing path shares one cache. Library users embedding the package can
call :func:`enable_persistent_cache` themselves.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/jax_comp_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument > ``JAX_COMPILATION_CACHE_DIR`` env
    var (which the host's sitecustomize may have masked by importing jax
    before the env could take effect at config level) > the shared default.
    Caches every computation regardless of compile time or size — remote
    round trips dominate here, not disk.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
