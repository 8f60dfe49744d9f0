"""Test harness: run on a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the driver separately dry-runs
the multichip path). Set RECONDET3D_TEST_TPU=1 to run the suite on the
real chip instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("RECONDET3D_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # The preinstalled TPU plugin ignores JAX_PLATFORMS; force via config.
    jax.config.update("jax_platforms", "cpu")
