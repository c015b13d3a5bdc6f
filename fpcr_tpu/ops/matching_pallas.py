"""Pallas TPU kernel: brute-force NN matching as a fused tiled
distance + running-argmin, the performance-critical op of the framework.

This is the TPU-native answer to the reference's ``Matching`` kernel
optimization ladder (/root/reference/src/CUDA/Matching_opt.cu:15-56 — drop
sqrt, pow→mult, query in registers, split loop; see BASELINE.md §matching).
Design:

* **Augmented matmul**: with ``p̂ = [-2p, 1]`` and ``q̂ = [q, |q|²]`` (padded
  to 8 lanes), ``p̂ · q̂ᵀ = |q|² - 2 p·q``, so the whole pairwise term is ONE
  MXU ``dot_general`` per (source-tile × target-tile) block; the per-source
  ``|p|²`` column is a broadcast add. No sqrt, exactly like the reference's
  monotone-distance optimization. Invalid (padded) targets are encoded
  directly in q̂ with a huge |q|² surrogate — no separate masking pass.
* **Streaming argmin**: grid = (source_tiles × target_tiles), target
  innermost; the running (min, argmin) columns live in the revisited output
  block (VMEM-resident across the target sweep). The [N, M] distance matrix
  never exists in HBM.
* **Tie-break parity**: within a tile ``jnp.argmin`` keeps the first
  minimum; across tiles strict ``<`` keeps the earlier tile — the
  reference's first-strict-min semantics
  (/root/reference/src/CUDA/ICP_point_to_point_clean.cu:53-57).

On non-TPU backends the kernel runs in interpreter mode (slow; tests only).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cloud import round_up

_LANES = 8  # augmented coordinate width (3 + 1 used, padded to 8)
_INVALID_SURROGATE = 1e30  # |q|² stand-in for masked targets


def _matching_kernel(p_ref, psq_ref, q_ref, best_d_ref, best_i_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    # d[bn, bm] = |p|² + (|q|² - 2 p·q)  — one MXU pass + column broadcast
    cross = jax.lax.dot_general(
        p_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = cross + psq_ref[:]  # psq is [bn, 1], broadcasts along lanes

    local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]  # [bn, 1]
    local_min = jnp.min(d, axis=1)[:, None]  # [bn, 1]

    bm = q_ref.shape[0]
    global_arg = j * bm + local_arg

    better = local_min < best_d_ref[:]  # strict: earlier tile wins ties
    best_d_ref[:] = jnp.where(better, local_min, best_d_ref[:])
    best_i_ref[:] = jnp.where(better, global_arg, best_i_ref[:])


def _augment(p: jnp.ndarray, q: jnp.ndarray, q_mask: Optional[jnp.ndarray],
             n_pad: int, m_pad: int):
    """Build p̂ [n_pad, 8], |p|² [n_pad, 1], q̂ [m_pad, 8] (f32)."""
    n, m = p.shape[0], q.shape[0]
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)

    p_hat = jnp.zeros((n_pad, _LANES), jnp.float32)
    p_hat = p_hat.at[:n, :3].set(-2.0 * p)
    p_hat = p_hat.at[:n, 3].set(1.0)
    # padded source rows: p̂ = 0 → d = 0 + psq = 0 everywhere; harmless rows.
    p_sq = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(jnp.sum(p * p, axis=1))

    q_sq = jnp.sum(q * q, axis=1)
    if q_mask is not None:
        q_sq = jnp.where(q_mask, q_sq, _INVALID_SURROGATE)
        qv = jnp.where(q_mask[:, None], q, 0.0)
    else:
        qv = q
    q_hat = jnp.full((m_pad, _LANES), 0.0, jnp.float32)
    q_hat = q_hat.at[:m, :3].set(qv)
    q_hat = q_hat.at[:m, 3].set(q_sq)
    # padded target rows get the invalid surrogate too
    if m_pad > m:
        q_hat = q_hat.at[m:, 3].set(_INVALID_SURROGATE)
    return p_hat, p_sq, q_hat


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_m", "interpret")
)
def nn_argmin_pallas(
    p: jnp.ndarray,
    q: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    *,
    block_n: int = 256,
    block_m: int = 8192,  # tuned on v5e: ~8% faster than 2048 in-loop
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas nearest-neighbor search: drop-in for ``matching.nn_argmin``.

    Returns ``(idx int32[N], sqdist float32[N])``.
    """
    n, m = p.shape[0], q.shape[0]
    bn = min(block_n, round_up(n, 8))
    bm = min(block_m, round_up(m, 128))
    n_pad = round_up(n, bn)
    m_pad = round_up(m, bm)

    p_hat, p_sq, q_hat = _augment(p, q, q_mask, n_pad, m_pad)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    grid = (n_pad // bn, m_pad // bm)
    best_d, best_i = pl.pallas_call(
        _matching_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, _LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, _LANES), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * _LANES + 4 * n_pad * m_pad,
            bytes_accessed=(n_pad * _LANES * 4 * (m_pad // bm)
                            + m_pad * _LANES * 4 * (n_pad // bn)
                            + n_pad * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(p_hat, p_sq, q_hat)

    return best_i[:n, 0], best_d[:n, 0]
