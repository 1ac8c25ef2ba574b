"""Shared JAX runtime setup: persistent compilation cache.

Full-model fwd+bwd programs take minutes to compile on the TPU toolchain;
the persistent cache makes every subsequent process start instant for
unchanged programs.  Call once at entrypoints (train CLI, bench, graft).
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str = "/root/.cache/jax_comp") -> None:
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
