"""Test config: run on CPU with a virtual 8-device mesh so sharding tests
work without TPU hardware. Must run before any test module imports jax."""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache: CPU compiles ARE local (unlike the tunneled
# TPU), so jitted train/eval steps cache across test processes — the
# multi-host tests spawn fresh interpreters that would otherwise recompile
# everything (~10 min of the suite), and full-suite re-runs get warm
# starts.
import getpass
import tempfile

_cache_dir = os.path.join(
    tempfile.gettempdir(),
    f"turkish_asr_jax_test_cache_{getpass.getuser()}")  # per-user: a
# world-shared path would hit permission errors for the second user
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
