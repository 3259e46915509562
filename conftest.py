"""Test configuration: force CPU with a virtual 8-device mesh so sharding is
testable without TPU hardware (SURVEY.md §4).  Must run before jax imports."""

import os

# Force CPU (the environment presets JAX_PLATFORMS=axon — a remote TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oddio_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# This environment's sitecustomize registers a remote-TPU PJRT plugin
# ("axon") in every interpreter and imports jax at startup, so jax.config has
# already captured JAX_PLATFORMS=axon; if the TPU tunnel is wedged, merely
# initializing backends hangs.  Tests are CPU-only — update the live config
# and drop the factory so they never touch it.
try:
    import jax
    from jax._src import xla_bridge as _xb

    jax.config.update("jax_platforms", "cpu")
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
