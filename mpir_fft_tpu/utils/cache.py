"""Persistent XLA compilation cache for the TPU entry points.

The staged 10^9-bit flagship compiles several multi-minute programs; the
reference pays its equivalent cost (gcc -O2 of one TU) once.  Pointing
JAX's persistent compile cache at a repo-local directory makes every
bench/CLI invocation after the first reuse the compiled executables
(tests/conftest.py does the same for the CPU test suite)."""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    import jax

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cache = os.path.join(repo, ".cache", "jax")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception:
        pass  # cache is an optimization; never fail an entry point over it
