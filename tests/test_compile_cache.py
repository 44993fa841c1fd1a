"""utils/compile_cache: persistent-cache config plumbing.

No remote-compile analogue exists in the reference (torch eager never
compiles); this is TPU-stack plumbing, so the tests pin the config contract
rather than any numeric behavior.
"""

import os

import jax

from dl_biomass_tpu.utils.compile_cache import (
    DEFAULT_CACHE_DIR,
    enable_persistent_cache,
)


def _snapshot():
    return (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )


def _restore(snap):
    jax.config.update("jax_compilation_cache_dir", snap[0])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", snap[1])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", snap[2])


def test_explicit_dir_wins(tmp_path):
    snap = _snapshot()
    try:
        d = str(tmp_path / "cache")
        assert enable_persistent_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        # cache-everything thresholds: remote round trips dominate, not disk
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    finally:
        _restore(snap)


def test_env_var_beats_default(tmp_path, monkeypatch):
    snap = _snapshot()
    try:
        d = str(tmp_path / "env_cache")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", d)
        assert enable_persistent_cache() == d
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        assert enable_persistent_cache() == DEFAULT_CACHE_DIR
    finally:
        _restore(snap)
