"""Root conftest: force the test session onto a virtual 8-device CPU mesh.

The axon TPU plugin registers itself via sitecustomize and overrides
``JAX_PLATFORMS`` through jax.config, so the env var alone is not enough —
we must update the config before any backend is initialized. Tests never
touch the (single, exclusively-held) real TPU chip; multi-chip sharding tests
run on the forced 8-device CPU backend
(``--xla_force_host_platform_device_count=8``), the fake-backend story the
CUDA reference lacks entirely (SURVEY.md §4).
"""

import os
import sys

# Must be set before the CPU backend is created.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
