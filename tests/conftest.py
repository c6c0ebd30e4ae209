"""Test configuration: force an 8-device virtual CPU mesh.

The test suite runs on CPU so it is deterministic, runs anywhere, and can
exercise multi-chip sharding without TPU hardware (the driver separately
dry-run-compiles the multi-chip path; benches run on the real chip).

The environment pins JAX_PLATFORMS=axon via sitecustomize, so the override
must go through jax.config after import — env vars alone are not enough.
Set AR2_TEST_TPU=1 to run the suite against the real backend instead.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("AR2_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
