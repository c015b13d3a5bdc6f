"""Batched registration — many cloud pairs in one device program.

The serving-throughput story the single-shot reference has no analog for:
``register_batch`` vmaps the full convergence-gated ICP loop over a leading
batch axis, so B registrations (e.g. consecutive LiDAR frame pairs) run as
one XLA program with all the per-call dispatch overhead amortized. Under
``vmap`` the ``lax.while_loop`` runs until every batch element has
converged; finished elements are masked no-ops (the standard JAX batching
semantics), so the wall time is that of the slowest element.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .icp import ICPConfig, ICPResult, _run_icp


@functools.partial(jax.jit, static_argnames=("config",))
def register_batch(
    sources: jnp.ndarray,
    targets: jnp.ndarray,
    config: ICPConfig = ICPConfig(),
    target_normals: Optional[jnp.ndarray] = None,
) -> ICPResult:
    """Register ``sources[b]`` onto ``targets[b]`` for every b.

    Args:
      sources: ``[B, N, 3]``; targets: ``[B, M, 3]``;
      target_normals: optional ``[B, M, 3]`` (plane metric).

    Returns an ``ICPResult`` whose fields carry the leading batch axis.
    """
    def single(src, tgt, nrm):
        return _run_icp(src, tgt, config, None, None, nrm, None)

    if target_normals is None:
        return jax.vmap(lambda s, t: single(s, t, None))(sources, targets)
    return jax.vmap(single)(sources, targets, target_normals)
