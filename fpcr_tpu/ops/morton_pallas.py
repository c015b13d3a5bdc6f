"""Pallas kernel for Morton band matching — the production large-N matcher.

The XLA formulation of the banded matcher (ops/morton.py) pays ~3-5 µs of
dispatch/DMA-issue overhead per band slice, which dominates at 1M points
(thousands of tiny [chunk, band] tiles). This kernel removes it:

* the per-chunk band *offsets* (Morton ranks, computed outside with one
  cheap searchsorted) arrive via **scalar prefetch**, so the kernel can
  issue its band DMAs itself;
* each grid step processes ``unroll`` consecutive chunks with **manually
  double-buffered** HBM→VMEM band copies — DMA for chunk j+1 overlaps the
  distance compute of chunk j;
* distances use the augmented-matmul trick from ops/matching_pallas.py
  (``p̂ = [-2p, 1]``, ``q̂ = [q, |q|²]`` → one MXU pass per band), with
  invalid/padded target rows encoded as a huge ``|q|²`` surrogate — no
  masking pass at all;
* matched coordinates (and optionally a second per-target table, e.g.
  normals) are extracted **in-kernel** with a one-hot × band matmul on the
  MXU — the ICP loop body stays completely free of HBM gathers.

Reference counterpart: none (the CUDA reference is brute force only); this
is the kernel that makes the 1M-point north star (BASELINE.md) reachable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cloud import round_up
from .morton import MortonTable, morton_codes

_LANES = 8
_INVALID_SURROGATE = 1e30


def _band_kernel_factory(chunk: int, band: int, unroll: int, with_extra: bool):
    def kernel(*refs):
        if with_extra:
            (bases_ref, p_ref, psq_ref, q_hbm, e_hbm,
             out_d, out_i, out_q, out_e, qbuf, ebuf, sems, esems) = refs
        else:
            (bases_ref, p_ref, psq_ref, q_hbm,
             out_d, out_i, out_q, qbuf, sems) = refs
        g = pl.program_id(0)

        def q_dma(slot, j):
            base = bases_ref[g * unroll + j]
            return pltpu.make_async_copy(
                q_hbm.at[pl.ds(base, band), :], qbuf.at[slot], sems.at[slot]
            )

        if with_extra:
            def e_dma(slot, j):
                base = bases_ref[g * unroll + j]
                return pltpu.make_async_copy(
                    e_hbm.at[pl.ds(base, band), :], ebuf.at[slot],
                    esems.at[slot]
                )

        q_dma(0, 0).start()
        if with_extra:
            e_dma(0, 0).start()

        col_iota = lax.broadcasted_iota(jnp.int32, (chunk, band), 1)

        for j in range(unroll):  # static unroll — straight-line code
            slot = j % 2
            if j + 1 < unroll:
                q_dma((j + 1) % 2, j + 1).start()
                if with_extra:
                    e_dma((j + 1) % 2, j + 1).start()
            q_dma(slot, j).wait()
            if with_extra:
                e_dma(slot, j).wait()

            rows = pl.ds(j * chunk, chunk)
            pc = p_ref[rows, :]  # [chunk, 8] augmented
            band_q = qbuf[slot]  # [band, 8]
            cross = jax.lax.dot_general(
                pc, band_q,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [chunk, band] = |q|² - 2 p·q (surrogate rows are huge)
            d = cross + psq_ref[rows, :]  # + |p|² (column broadcast)

            arg = jnp.argmin(d, axis=1).astype(jnp.int32)
            dmin = jnp.min(d, axis=1)
            onehot = (col_iota == arg[:, None]).astype(jnp.float32)
            matched_q = jax.lax.dot_general(
                onehot, band_q,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [chunk, 8] — in-VMEM row extraction on the MXU

            base = bases_ref[g * unroll + j]
            out_d[rows, :] = dmin[:, None]
            out_i[rows, :] = base + arg[:, None]
            out_q[rows, :] = matched_q
            if with_extra:
                matched_e = jax.lax.dot_general(
                    onehot, ebuf[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_e[rows, :] = matched_e

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "window", "unroll", "interpret"),
)
def morton_nn_pallas(
    p: jnp.ndarray,
    table: MortonTable,
    extra: Optional[jnp.ndarray] = None,
    chunk: int = 256,
    window: int = 256,
    unroll: int = 16,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Drop-in for ``morton.morton_nn`` backed by the Pallas band kernel.

    Same contract: ``p`` rows spatially coherent (pre-sorted source),
    ``extra`` already in table order. Returns
    ``(matched_points, sqdist, idx_sorted, matched_extra)``.
    """
    n = p.shape[0]
    p = p.astype(jnp.float32)

    n_pad = round_up(n, chunk)
    num_chunks = n_pad // chunk
    u = unroll
    while num_chunks % u:
        u //= 2
    u = max(u, 1)
    num_groups = num_chunks // u

    band = round_up(chunk + 2 * window, 128)

    # augmented source: p̂ = [-2p, 1, 0...], |p|² column
    p_hat = jnp.zeros((n_pad, _LANES), jnp.float32)
    p_hat = p_hat.at[:n, :3].set(-2.0 * p)
    p_hat = p_hat.at[:n, 3].set(1.0)
    p_sq = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        jnp.sum(p * p, axis=1))

    # augmented target in Morton order: q̂ = [q, |q|², 0...]; rows beyond
    # valid_count (masked) and band padding get the huge surrogate
    m = table.points_sorted.shape[0]
    m_pad = round_up(m, 8) + band  # slack so any base+band fits
    q = table.points_sorted
    q_sq = jnp.sum(q * q, axis=1)
    row_ids = jnp.arange(m)
    q_sq = jnp.where(row_ids < table.valid_count, q_sq, _INVALID_SURROGATE)
    q_hat = jnp.zeros((m_pad, _LANES), jnp.float32)
    q_hat = q_hat.at[:m, :3].set(q)
    q_hat = q_hat.at[:m, 3].set(q_sq)
    q_hat = q_hat.at[m:, 3].set(_INVALID_SURROGATE)

    e_hat = None
    if extra is not None:
        e_hat = jnp.zeros((m_pad, _LANES), jnp.float32)
        e_hat = e_hat.at[:m, :3].set(extra.astype(jnp.float32))

    # per-chunk band bases (8-aligned for efficient DMA), via one searchsorted
    p_padded = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(p)
    probe_pts = p_padded.reshape(num_chunks, chunk, 3)[:, chunk // 2, :]
    probe_codes = morton_codes(probe_pts, table.lo, table.inv_extent)
    ranks = jnp.searchsorted(table.codes_sorted, probe_codes).astype(jnp.int32)
    bases = jnp.clip(ranks - (band // 2), 0, m_pad - band) & ~jnp.int32(7)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    with_extra = e_hat is not None
    kernel = _band_kernel_factory(chunk, band, u, with_extra)

    in_specs = [
        pl.BlockSpec((u * chunk, _LANES), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u * chunk, 1), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),  # q̂ stays in HBM
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((u * chunk, 1), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u * chunk, 1), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u * chunk, _LANES), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((2, band, _LANES), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    operands = [p_hat, p_sq, q_hat]
    if with_extra:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        out_shape.append(jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((u * chunk, _LANES), lambda g, *_: (g, 0),
                                      memory_space=pltpu.VMEM))
        scratch = [
            pltpu.VMEM((2, band, _LANES), jnp.float32),
            pltpu.VMEM((2, band, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        operands = [p_hat, p_sq, q_hat, e_hat]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_groups,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bases, *operands)

    if with_extra:
        best_d, best_i, matched_q, matched_e = outs
        matched_e = matched_e[:n, :3]
    else:
        best_d, best_i, matched_q = outs
        matched_e = None

    matched = matched_q[:n, :3]
    dmin = jnp.maximum(best_d[:n, 0], 0.0)
    idx_sorted = jnp.clip(best_i[:n, 0], 0, m - 1)
    return matched, dmin, idx_sorted, matched_e
