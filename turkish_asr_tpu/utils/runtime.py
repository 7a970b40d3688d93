"""Runtime setup helpers (compilation cache, profiling hooks)."""

import os

import jax


def enable_compilation_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache.

    TPU first-compiles of the train step run minutes; with the cache,
    repeat CLI invocations (train -> resume -> infer) reuse compiled
    executables across processes.
    """
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def start_profiler_trace(profile_dir):
    """Capture a jax.profiler trace into profile_dir (or no-op if None)."""
    if not profile_dir:
        return None
    os.makedirs(profile_dir, exist_ok=True)
    jax.profiler.start_trace(profile_dir)
    return profile_dir


def stop_profiler_trace(handle):
    if handle:
        jax.profiler.stop_trace()
