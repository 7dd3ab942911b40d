"""Process-level JAX setup helpers."""

from __future__ import annotations

import os


def honor_platform_env():
    """Make JAX_PLATFORMS=cpu actually work under the axon TPU plugin.

    The plugin registers itself regardless of the JAX_PLATFORMS env var
    (it is silently ignored), so a user asking a CLI for a CPU run gets
    the TPU anyway — and contends with whatever owns it. The config
    knob IS authoritative; mirror the env var into it. Must run before
    the first jax device use (CLIs call this at main() entry;
    __graft_entry__ does the same for the driver's dry run)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or \
            "host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


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
