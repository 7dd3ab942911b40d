"""Process-level JAX setup helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/isdf_tpu_xla"):
    """Persist compiled executables across processes.

    Cold compiles of the fused train bundle take minutes on the remote TPU
    compile service; the persistent cache turns every later run into a
    ~second load. Safe to call multiple times."""
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # persist EVERY compile, including sub-second ones: the remote
        # compile service's latency is not bounded below (observed
        # minutes for an (8,)-shaped calibration fn during congestion),
        # so "too small to be worth caching" does not exist here
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax or read-only fs: lazily fall back to in-memory
