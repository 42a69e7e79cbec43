"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding correctness (1 chip vs N chips bit-identical) is validated here
without TPU hardware; the real-chip path is exercised by bench.py and the
driver's compile checks.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
