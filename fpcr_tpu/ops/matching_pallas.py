"""Pallas TPU kernel: brute-force NN matching as a fused tiled
distance + running-argmin, the performance-critical op of the framework.

This is the TPU-native answer to the reference's ``Matching`` kernel
optimization ladder (/root/reference/src/CUDA/Matching_opt.cu:15-56 — drop
sqrt, pow→mult, query in registers, split loop; see BASELINE.md §matching).
Design:

* **Full-distance augmented matmul**: with ``p̂ = [-2p, 1, |p|²]`` and
  ``q̂ = [q, |q|², 1]`` (padded to 8 lanes), ``p̂ · q̂ = |p|² − 2 p·q + |q|²``
  is the EXACT squared distance — the whole pairwise term is ONE MXU
  ``dot_general`` per (source-tile × target-tile) block with zero
  elementwise VPU work (round 1 added ``|p|²`` as a separate broadcast
  pass; folding it into a 5th lane measured ~35% faster at 16k). No sqrt,
  exactly like the reference's monotone-distance optimization. Invalid
  (padded) targets are encoded directly in q̂ with a huge ``|q|²``
  surrogate — no separate masking pass.
* **Lane-major target layout**: q̂ is fed transposed as ``[8, M]`` so a
  target block is a 128-aligned lane slice — a ``[M, 8]`` layout would pad
  its minor dim to 128 in VMEM (16× DMA waste).
* **Streaming argmin**: grid = (source_tiles × target_tiles), target
  innermost; the running (min, argmin) columns live in the revisited output
  block (VMEM-resident across the target sweep). The [N, M] distance matrix
  never exists in HBM.
* **Tie-break parity**: within a tile ``jnp.argmin`` keeps the first
  minimum; across tiles strict ``<`` keeps the earlier tile — the
  reference's first-strict-min semantics
  (/root/reference/src/CUDA/ICP_point_to_point_clean.cu:53-57).

Measured (v5e, slope method with separate min-of-k legs, N=M=16,384):
~2.1-2.25 ms standalone vs the reference's best CUDA kernel 2.30 ms on an
RTX 2060 (``Matching_loop_optimized.csv``); the full fused ICP iteration
(matching + solve + transform + error) runs at ~2.29 ms/iter. The kernel is
MXU-bound: HIGHEST-precision f32 matmuls decompose into ~6 bf16 passes on
the bf16-native MXU — see docs/performance.md for the precision study.

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

_LANES = 8  # augmented coordinate width (5 used, padded to 8 sublanes)
_INVALID_SURROGATE = 1e30  # |q|² stand-in for masked targets


def _matching_kernel(p_ref, qT_ref, best_d_ref, best_i_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    # d[bn, bm] = |p|² - 2 p·q + |q|² — one MXU pass, no VPU arithmetic
    d = jax.lax.dot_general(
        p_ref[:], qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]  # [bn, 1]
    local_min = jnp.min(d, axis=1)[:, None]  # [bn, 1]

    bm = qT_ref.shape[1]
    global_arg = j * bm + local_arg

    better = local_min < best_d_ref[:]  # strict: earlier tile wins ties
    best_d_ref[:] = jnp.where(better, local_min, best_d_ref[:])
    best_i_ref[:] = jnp.where(better, global_arg, best_i_ref[:])


def _augment(p: jnp.ndarray, q: jnp.ndarray, q_mask: Optional[jnp.ndarray],
             n_pad: int, m_pad: int):
    """Build p̂ [n_pad, 8] = [-2p, 1, |p|², 0...] and the lane-major
    q̂ᵀ [8, m_pad] with rows [q, |q|², 1, 0...] (f32)."""
    n, m = p.shape[0], q.shape[0]
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)

    # single concat (one fused XLA kernel) instead of scatter .at[].set
    # chains — this runs EVERY loop iteration (p moves), so its kernel
    # count matters
    p_hat = jnp.concatenate([
        -2.0 * p,
        jnp.ones((n, 1), jnp.float32),
        jnp.sum(p * p, axis=1, keepdims=True),
        jnp.zeros((n, _LANES - 5), jnp.float32),
    ], axis=1)
    if n_pad > n:
        # padded source rows: p̂ = 0 → d = 0 everywhere; harmless rows.
        p_hat = jnp.pad(p_hat, ((0, n_pad - n), (0, 0)))

    q_sq = jnp.sum(q * q, axis=1)
    if q_mask is not None:
        q_sq = jnp.where(q_mask, q_sq, _INVALID_SURROGATE)
        qv = jnp.where(q_mask[:, None], q, 0.0)
    else:
        qv = q
    qT = jnp.zeros((_LANES, m_pad), jnp.float32)
    qT = qT.at[:3, :m].set(qv.T)
    qT = qT.at[3, :m].set(q_sq)
    qT = qT.at[4, :m].set(1.0)
    # padded target rows get the invalid surrogate too (lane-4 left at 0 is
    # irrelevant — the surrogate alone dominates the min)
    if m_pad > m:
        qT = qT.at[3, m:].set(_INVALID_SURROGATE)
    return p_hat, qT


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_m", "interpret")
)
def nn_argmin_pallas(
    p: jnp.ndarray,
    q: jnp.ndarray,
    q_mask: Optional[jnp.ndarray] = None,
    *,
    block_n: int = 256,
    block_m: int = 8192,  # (256, 8192): d block = 8 MB, best on v5e
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

    p_hat, qT = _augment(p, q, q_mask, n_pad, m_pad)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    grid = (n_pad // bn, m_pad // bm)
    best_d, best_i = pl.pallas_call(
        _matching_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, _LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES, bm), lambda i, j: (0, j),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * _LANES + 2 * n_pad * m_pad,
            bytes_accessed=(n_pad * _LANES * 4 * (m_pad // bm)
                            + m_pad * _LANES * 4 * (n_pad // bn)
                            + n_pad * 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(p_hat, qT)

    # f32 cancellation can leave tiny negatives on exact/near-zero matches
    return best_i[:n, 0], jnp.maximum(best_d[:n, 0], 0.0)
