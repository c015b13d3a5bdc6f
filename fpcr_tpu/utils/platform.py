"""Platform selection helpers.

The axon TPU plugin (this environment's PJRT tunnel to the single real chip)
force-sets ``jax_platforms`` through jax.config at interpreter start, so the
usual ``JAX_PLATFORMS=cpu`` env var is silently ignored. These helpers make
platform choice explicit and robust. Only one process can hold the TPU at a
time — CPU-only tooling (tests, data prep) should call ``force_cpu()`` first.
"""

from __future__ import annotations

import os

import jax


def force_cpu(host_device_count: int | None = None) -> None:
    """Pin this process to the CPU backend (optionally with N virtual
    devices for sharding tests). Must run before first backend use."""
    if host_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_device_count}"
            ).strip()
    jax.config.update("jax_platforms", "cpu")


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def backend_name() -> str:
    return jax.devices()[0].platform
