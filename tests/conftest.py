"""Test harness: force CPU with a virtual 8-device mesh.

Multi-chip sharding is validated the standard JAX way — a host-platform
device count override — since real multi-chip hardware is not available in
CI (SURVEY.md §4). The environment pins JAX_PLATFORMS=axon (the TPU tunnel),
so the env var alone is not enough; the config update below is what wins.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Golden-parity tests compare against fp32 torch: keep MXU-style matmul
# downcasts out of the test suite.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} x {jax.devices()[0].platform}"
