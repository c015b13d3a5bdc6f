"""Multi-host (DCN) initialization helpers.

The reference has no distributed story at all (SURVEY.md §2.4). For slices
larger than one host, JAX's standard recipe applies: call
``initialize_multihost()`` once per process before any backend use, then the
``parallel.dist_icp`` code works unchanged — ``make_mesh()`` over
``jax.devices()`` sees the global device set, shard_map shards the source
globally, and the tiny moment psums ride ICI within a host slice and DCN
across hosts (they are a few hundred bytes — DCN latency, not bandwidth,
bound).

Single-process (CPU tests, one-chip axon tunnel) needs none of this; all
functions are no-ops/guards there.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``).
    Returns True if multi-process mode was initialized."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False  # single-process
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_shard_bounds(n: int) -> tuple:
    """Row range of the global source cloud this process should load —
    per-host data loading so no host materializes the full 1M+ cloud."""
    pc, pid = jax.process_count(), jax.process_index()
    per = (n + pc - 1) // pc
    lo = pid * per
    return lo, min(lo + per, n)
