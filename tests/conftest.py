"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding correctness (1 chip vs N chips bit-identical) is validated here
without TPU hardware; the real-chip path is exercised by bench.py and the
driver's compile checks.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU (axon) backend in
# every process and overrides JAX_PLATFORMS; pin the platform through the
# config API so tests genuinely run on the virtual 8-device CPU mesh and
# never contend for the single real chip.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of the integrator; caching makes reruns (CI, -x iteration) fast.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
