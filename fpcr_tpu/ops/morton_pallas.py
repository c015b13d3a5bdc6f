"""Pallas kernel for Morton band matching — the production large-N matcher.

The XLA formulation of the banded matcher (ops/morton.py) pays ~3-5 µs of
dispatch/DMA-issue overhead per band slice, which dominates at 1M points
(thousands of tiny [chunk, band] tiles). This kernel removes it:

* the per-chunk band *offsets* (Morton ranks, computed outside with one
  cheap searchsorted) arrive via **scalar prefetch**, so the kernel issues
  its own band DMAs;
* everything is laid out **lane-major/transposed** — the augmented target
  table is ``[8, M]`` (a band is a 128-aligned lane slice, exactly what
  Mosaic DMA wants), sources are ``[8, N]``, per-point scalars are
  ``[num_chunks, chunk]`` — so no VMEM block wastes lanes (a ``[rows, 1]``
  block would pad its lane dim 128×, which OOMs VMEM at 1M points);
* each grid step processes ``unroll`` consecutive chunks with **manually
  double-buffered** HBM→VMEM band copies — the DMA for chunk j+1 overlaps
  the distance compute of chunk j;
* distances use the augmented-matmul trick (``p̂ = [-2p, 1]``,
  ``q̂ = [q, |q|²]`` → one MXU pass per band), with invalid/padded target
  rows encoded as a huge ``|q|²`` surrogate — no masking pass at all;
* matched coordinates (and optionally a second per-target table, e.g.
  normals) are extracted **in-kernel** with a band × one-hot matmul on the
  MXU — the ICP loop body stays completely free of HBM gathers;
* ``mode='packed6'`` (default) applies the K-packed bf16x6 layout from
  ``matching_pallas.py``: each f32 coordinate splits into three bf16 parts
  (h+m+l, exact), the six significant cross-term pairs land in their own
  16-sublane bf16 tile group (K=96 ≤ 128), and the band distance becomes
  ONE bf16 MXU pass instead of HIGHEST's ~6 sequential f32 passes —
  f32-grade distances (~1e-6 relative) at bf16 speed. The one-hot
  extraction matmuls become *exact* under bf16: a one-hot row SELECTS a
  single bf16 value per output, so summing the h/m/l slab rows
  reconstructs the f32 coordinates bit-identically. 1M-point ICP drops
  from 8.6 to 4.8 ms/iter (w=64, c=512). ``mode='highest'`` keeps the
  bit-exact f32 kernel.

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

from ..core.cloud import padded_chunks, round_up
from .morton import MortonTable, morton_codes

_SUBLANES = 8  # augmented coordinate rows in the transposed tables
_INVALID_SURROGATE = 1e30
_ALIGN = 128  # lane-dim DMA alignment required by Mosaic tiling

# K-packed bf16x6 layout (mode='packed6'): the six kept term pairs of the
# triple-bf16 split (x = h+m+l), each pair in its own 16-sublane group
# (bf16 tile alignment) -> one K=96 bf16 MXU pass replaces HIGHEST's ~6
# sequential passes. Extraction reads single slabs of the same buffer:
# a one-hot matmul SELECTS one bf16 value per output, so h+m+l slab sums
# reconstruct the f32 coordinates EXACTLY (better than approximate: the
# extracted points are bit-identical to the f32 table).
_PAIRS = ((0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1))  # (p_part, q_part)
_GROUP = 16  # sublanes per pair slot (bf16 tile height)
_PACKED_ROWS = _GROUP * len(_PAIRS)  # 96 <= 128: still one MXU pass
# q-side slab row offsets holding one copy each of (h, m, l):
# pair0 carries qh, pair1 qm, pair3 ql
_Q_SLAB_ROWS = (0 * _GROUP, 1 * _GROUP, 3 * _GROUP)


# the split lives in matching_pallas (the base kernel module) — one
# implementation of the reduce_precision triple-bf16 split to keep in sync
from .matching_pallas import split3_f32 as _split3_f32


def _pack6(xT: jnp.ndarray, side: int) -> jnp.ndarray:
    """Pack a transposed augmented table ``[8, M]`` into the K=96 bf16
    layout ``[96, M]``: pair slot s holds split part ``_PAIRS[s][side]``
    in its first 8 sublanes (8 zero rows complete the bf16 tile)."""
    parts = _split3_f32(xT)
    rows = xT.shape[0]
    m = xT.shape[1]
    out = jnp.zeros((_PACKED_ROWS, m), jnp.bfloat16)
    for s, pair in enumerate(_PAIRS):
        out = out.at[s * _GROUP:s * _GROUP + rows].set(
            parts[pair[side]].astype(jnp.bfloat16))
    return out


def _pack3(xT: jnp.ndarray) -> jnp.ndarray:
    """Pack a ``[8, M]`` table into 3 split slabs ``[48, M]`` bf16 (h, m, l
    at 16-row offsets) for exact one-hot extraction."""
    parts = _split3_f32(xT)
    rows = xT.shape[0]
    m = xT.shape[1]
    out = jnp.zeros((3 * _GROUP, m), jnp.bfloat16)
    for s in range(3):
        out = out.at[s * _GROUP:s * _GROUP + rows].set(
            parts[s].astype(jnp.bfloat16))
    return out


def _band_kernel_pipelined_factory(chunk: int, band: int, unroll: int,
                                   with_extra: bool, depth: int = 1):
    """Software-pipelined packed6 variant (``mode='packed6_pipe'``).

    The production kernel's per-chunk chain is matmul(MXU) → argmin(VPU)
    → one-hot(VPU) → extract(MXU), fully sequential within a chunk — the
    roofline puts the measured iteration ~3× above the overlapped
    MXU/VPU floor. This variant stages the distance matmul ONE chunk
    ahead of the reduce/extract through an explicit VMEM d-buffer ring
    (``depth + 1`` slots), so each pipeline step presents Mosaic with
    adjacent INDEPENDENT work: the matmul of chunk j and the reduction of
    chunk j−depth. Band DMAs use ``depth + 3`` slots (bands j−depth..j+2
    live simultaneously: extract, staged matmuls, in-flight, start).
    Per-chunk math is identical to packed6 — outputs are bit-identical
    (parity test in tests/test_morton.py). depth=1 is the shipped
    default (measured −4–6% on hardware); depth=2 is the experimental
    ``mode='packed6_pipe2'``.
    """
    def kernel(*refs):
        if with_extra:
            (bases_ref, pt_ref, q_hbm, e_hbm,
             out_d, out_i, out_q, out_e, qbuf, ebuf, dbuf,
             sems, esems) = refs
        else:
            (bases_ref, pt_ref, q_hbm,
             out_d, out_i, out_q, qbuf, dbuf, sems) = refs
        g = pl.program_id(0)

        def q_dma(slot, j):
            base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
            return pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(base, band)], qbuf.at[slot], sems.at[slot]
            )

        if with_extra:
            def e_dma(slot, j):
                base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
                return pltpu.make_async_copy(
                    e_hbm.at[:, pl.ds(base, band)], ebuf.at[slot],
                    esems.at[slot]
                )

        nslots = depth + 3
        ndslots = depth + 1
        for j in range(min(2, unroll)):
            q_dma(j % nslots, j).start()
            if with_extra:
                e_dma(j % nslots, j).start()

        row_iota = lax.broadcasted_iota(jnp.int32, (band, chunk), 0)

        for j in range(unroll + depth):  # static: straight-line pipeline
            if j < unroll:
                slot = j % nslots
                q_dma(slot, j).wait()
                if with_extra:
                    e_dma(slot, j).wait()
                if j + 2 < unroll:
                    q_dma((j + 2) % nslots, j + 2).start()
                    if with_extra:
                        e_dma((j + 2) % nslots, j + 2).start()
                cols = pl.ds(j * chunk, chunk)
                dbuf[j % ndslots] = jax.lax.dot_general(
                    qbuf[slot], pt_ref[:, cols],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [band, chunk] — chunk j's distances, consumed at j+depth
            if j >= depth:
                jp = j - depth
                sp = jp % nslots
                d = dbuf[jp % ndslots]
                arg = jnp.argmin(d, axis=0).astype(jnp.int32)
                dmin = jnp.min(d, axis=0)
                onehot = (row_iota == arg[None, :]).astype(jnp.bfloat16)
                matched_all = jax.lax.dot_general(
                    qbuf[sp], onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                r0, r1, r2 = _Q_SLAB_ROWS
                matched_q = (matched_all[r0:r0 + _SUBLANES]
                             + matched_all[r1:r1 + _SUBLANES]
                             + matched_all[r2:r2 + _SUBLANES])
                base = bases_ref[g * unroll + jp]
                out_d[pl.ds(jp, 1), :] = dmin[None, :]
                out_i[pl.ds(jp, 1), :] = (base + arg)[None, :]
                out_q[pl.ds(jp, 1), :, :] = matched_q[None, :, :]
                if with_extra:
                    matched_e_all = jax.lax.dot_general(
                        ebuf[sp], onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    matched_e = (matched_e_all[0:_SUBLANES]
                                 + matched_e_all[_GROUP:_GROUP + _SUBLANES]
                                 + matched_e_all[2 * _GROUP:
                                                 2 * _GROUP + _SUBLANES])
                    out_e[pl.ds(jp, 1), :, :] = matched_e[None, :, :]

    return kernel


def _band_kernel_factory(chunk: int, band: int, unroll: int, with_extra: bool,
                         packed: bool, packed_idx: bool = False,
                         idx_bits: int = 0):
    def kernel(*refs):
        if with_extra:
            (bases_ref, pt_ref, q_hbm, e_hbm,
             out_d, out_i, out_q, out_e, qbuf, ebuf, sems, esems) = refs
        else:
            (bases_ref, pt_ref, q_hbm,
             out_d, out_i, out_q, qbuf, sems) = refs
        g = pl.program_id(0)

        def q_dma(slot, j):
            base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
            return pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(base, band)], qbuf.at[slot], sems.at[slot]
            )

        if with_extra:
            def e_dma(slot, j):
                base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
                return pltpu.make_async_copy(
                    e_hbm.at[:, pl.ds(base, band)], ebuf.at[slot],
                    esems.at[slot]
                )

        q_dma(0, 0).start()
        if with_extra:
            e_dma(0, 0).start()

        row_iota = lax.broadcasted_iota(jnp.int32, (band, chunk), 0)

        for j in range(unroll):  # static unroll — straight-line code
            slot = j % 2
            if j + 1 < unroll:
                q_dma((j + 1) % 2, j + 1).start()
                if with_extra:
                    e_dma((j + 1) % 2, j + 1).start()
            q_dma(slot, j).wait()
            if with_extra:
                e_dma(slot, j).wait()

            cols = pl.ds(j * chunk, chunk)
            pcT = pt_ref[:, cols]  # [8|96, chunk] augmented source slab
            band_q = qbuf[slot]  # [8|96, band] transposed augmented target
            d = jax.lax.dot_general(
                band_q, pcT,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if packed else jax.lax.Precision.HIGHEST,
            )  # [band, chunk] = |q|² - 2 p·q + |p|² — the distance fully
            # inside the matmul (q̂'s ones row picks up p̂'s |p|² row).
            # packed: ONE K=96 bf16 pass (f32-grade); else ~6 HIGHEST passes

            if packed_idx:
                # packed (value|index) reduction (round-5, from the brute
                # matcher's measured floor study): nonneg-f32 bits are
                # order-preserving as int32, so splicing the band row into
                # the low idx_bits mantissa bits collapses min+argmin into
                # ONE int32 min pass — the [band, chunk] tile streams
                # through the VPU once instead of twice. Selection
                # quantization (~2^-(23-idx_bits) relative) only swaps
                # near-ties; exact distances are recomputed outside
                # against the selected (extracted) target.
                bits = jax.lax.bitcast_convert_type(
                    jnp.maximum(d, 0.0), jnp.int32)
                pk = (bits & jnp.int32(~((1 << idx_bits) - 1))) | row_iota
                pmin = jnp.min(pk, axis=0)  # [chunk] — the single pass
                arg = pmin & jnp.int32((1 << idx_bits) - 1)
                dmin = jax.lax.bitcast_convert_type(
                    pmin & jnp.int32(~((1 << idx_bits) - 1)), jnp.float32)
            else:
                arg = jnp.argmin(d, axis=0).astype(jnp.int32)  # [chunk]
                dmin = jnp.min(d, axis=0)
            onehot_dtype = jnp.bfloat16 if packed else jnp.float32
            onehot = (row_iota == arg[None, :]).astype(onehot_dtype)
            matched_all = jax.lax.dot_general(
                band_q, onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # one-hot extraction SELECTS single values, so bf16 slab
                # sums reconstruct f32 exactly in packed mode; in highest
                # mode default bf16 passes would round the extracted
                # coordinates to bf16 and cap ICP at ~1e-3 accuracy
                precision=None if packed else jax.lax.Precision.HIGHEST,
            )  # [8|96, chunk] — in-VMEM column extraction on the MXU
            if packed:
                r0, r1, r2 = _Q_SLAB_ROWS
                matched_q = (matched_all[r0:r0 + _SUBLANES]
                             + matched_all[r1:r1 + _SUBLANES]
                             + matched_all[r2:r2 + _SUBLANES])
            else:
                matched_q = matched_all

            base = bases_ref[g * unroll + j]
            out_d[pl.ds(j, 1), :] = dmin[None, :]
            out_i[pl.ds(j, 1), :] = (base + arg)[None, :]
            out_q[pl.ds(j, 1), :, :] = matched_q[None, :, :]
            if with_extra:
                matched_e_all = jax.lax.dot_general(
                    ebuf[slot], onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=None if packed else jax.lax.Precision.HIGHEST,
                )
                if packed:
                    matched_e = (matched_e_all[0:_SUBLANES]
                                 + matched_e_all[_GROUP:_GROUP + _SUBLANES]
                                 + matched_e_all[2 * _GROUP:
                                                 2 * _GROUP + _SUBLANES])
                else:
                    matched_e = matched_e_all
                out_e[pl.ds(j, 1), :, :] = matched_e[None, :, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "window", "unroll", "interpret", "mode"),
)
def morton_nn_pallas(
    p: jnp.ndarray,
    table: MortonTable,
    extra: Optional[jnp.ndarray] = None,
    chunk: int = 256,
    window: int = 256,
    unroll: int = 16,
    interpret: Optional[bool] = None,
    mode: str = "packed6",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Drop-in for ``morton.morton_nn`` backed by the Pallas band kernel.

    Same contract: ``p`` rows spatially coherent (pre-sorted source),
    ``extra`` already in table order. Returns
    ``(matched_points, sqdist, idx_sorted, matched_extra)``.

    ``mode="packed6"`` (default) uses the K-packed bf16x6 layout: one K=96
    bf16 MXU pass for the band distances (f32-grade, see module docstring)
    and EXACT one-hot extraction via bf16 slab sums, with the distance
    matmul software-pipelined one chunk ahead of the reduce/extract
    (round 5: bit-identical outputs, −4–6% on hardware at both production
    sizes; ``"packed6_pipe"`` is an alias, ``"packed6_seq"`` keeps the
    original double-buffered schedule for A/B). ``mode="highest"`` keeps
    the round-1 bit-exact f32 kernel. ``mode="packed6_idx"`` (opt-in)
    additionally collapses the per-chunk min+argmin into ONE int32 min
    over packed (value|index) words — one fewer VPU pass over every
    [band, chunk] tile; returned distances are recomputed exactly against
    the selected target, selection may swap near-ties within
    ~2^-(23-log2(band)) relative (same class packed6 itself swaps).
    """
    if mode not in ("packed6", "highest", "packed6_idx", "packed6_pipe",
                    "packed6_seq", "packed6_pipe2", "packed6_pipe3"):
        raise ValueError(f"unknown mode {mode!r}")
    packed = mode != "highest"
    packed_idx = mode == "packed6_idx"
    # the pipelined schedule IS packed6 (bit-identical math, measured
    # faster at both production sizes — BENCH_NOTES round-5 pipe A/Bs);
    # 'packed6_pipe'/'packed6_pipe2'/'packed6_pipe3' pin the stage depth,
    # 'packed6_seq' keeps the original double-buffered schedule for A/B
    pipelined = mode in ("packed6", "packed6_pipe", "packed6_pipe2",
                         "packed6_pipe3")
    n = p.shape[0]
    p = p.astype(jnp.float32)

    # pad the chunk count so the static unroll divides it: an awkward
    # count (259,200 pts → 507 chunks, largest pow2 divisor 1) would
    # serialize the band DMA pipeline (measured on the wide-plane scene)
    num_chunks, u = padded_chunks(n, chunk, unroll)
    n_pad = num_chunks * chunk
    num_groups = num_chunks // u

    # +_ALIGN slack: bases are rounded down to the 128-lane alignment, which
    # can shift the window by up to 127 rows
    band = round_up(chunk + 2 * window + _ALIGN, _ALIGN)

    # transposed augmented source: p̂T rows = [-2x, -2y, -2z, 1, |p|², 0...]
    p_hat_t = jnp.zeros((_SUBLANES, n_pad), jnp.float32)
    p_hat_t = p_hat_t.at[:3, :n].set(-2.0 * p.T)
    p_hat_t = p_hat_t.at[3, :n].set(1.0)
    p_hat_t = p_hat_t.at[4, :n].set(jnp.sum(p * p, axis=1))

    # transposed augmented target in Morton order: q̂T[0:3] = coords,
    # q̂T[3] = |q|² (huge surrogate for masked rows and band padding)
    m = table.points_sorted.shape[0]
    m_pad = round_up(m, _ALIGN) + band
    q = table.points_sorted
    q_sq = jnp.sum(q * q, axis=1)
    row_ids = jnp.arange(m)
    q_sq = jnp.where(row_ids < table.valid_count, q_sq, _INVALID_SURROGATE)
    q_hat_t = jnp.zeros((_SUBLANES, m_pad), jnp.float32)
    q_hat_t = q_hat_t.at[:3, :m].set(q.T)
    q_hat_t = q_hat_t.at[3, :m].set(q_sq)
    q_hat_t = q_hat_t.at[3, m:].set(_INVALID_SURROGATE)
    q_hat_t = q_hat_t.at[4, :].set(1.0)

    e_hat_t = None
    if extra is not None:
        e_hat_t = jnp.zeros((_SUBLANES, m_pad), jnp.float32)
        e_hat_t = e_hat_t.at[:3, :m].set(extra.astype(jnp.float32).T)

    # per-chunk band bases (128-aligned for the lane-dim DMA), via one
    # searchsorted over the N/chunk probe codes
    # probe rows must never be padding: a zero-pad probe quantizes to the
    # origin cell and centers the final chunk's band at an arbitrary rank
    # (review find r3, same fix as ops/morton.py) — pad with the last real
    # point for the probe computation (the kernel's own padding masks via
    # the [4,:] = 1e9 surrogate column, unaffected by this)
    p_padded = (jnp.broadcast_to(p[n - 1], (n_pad, 3)).at[:n].set(p)
                if n_pad > n else p)
    probe_pts = p_padded.reshape(num_chunks, chunk, 3)[:, chunk // 2, :]
    probe_codes = morton_codes(probe_pts, table.lo, table.inv_extent)
    ranks = jnp.searchsorted(table.codes_sorted, probe_codes).astype(jnp.int32)
    bases = jnp.clip(ranks - (band // 2), 0, m_pad - band) & ~jnp.int32(_ALIGN - 1)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    with_extra = e_hat_t is not None
    # packed-idx: the spliced index addresses band rows, so idx_bits is
    # set by the (static) band height, not the table size — 10 bits at
    # the production band of 768 (quantization ~2^-13 relative)
    idx_bits = max(1, (band - 1).bit_length()) if packed_idx else 0
    if pipelined:
        # stage depth: deeper staging measured −16% @262k and never worse
        # (BENCH_NOTES round-5 pipe A/Bs), but each extra stage holds one
        # more [band, chunk] f32 distance tile in VMEM — mode='packed6'
        # auto-clamps so the d-ring stays ≤6 MiB (the "budget DOWN" VMEM
        # lesson); explicit pipeN modes pin the depth for A/B
        pipe_depth = {"packed6_pipe": 1, "packed6_pipe2": 2,
                      "packed6_pipe3": 3}.get(mode, 2)
        if mode == "packed6":
            while (pipe_depth > 1
                   and (pipe_depth + 1) * band * chunk * 4 > 6 * 2 ** 20):
                pipe_depth -= 1
        kernel = _band_kernel_pipelined_factory(chunk, band, u, with_extra,
                                                pipe_depth)
    else:
        pipe_depth = 1
        kernel = _band_kernel_factory(chunk, band, u, with_extra, packed,
                                      packed_idx, idx_bits)

    if packed:
        p_hat_t = _pack6(p_hat_t, 0)  # [96, n_pad] bf16
        q_hat_t = _pack6(q_hat_t, 1)  # [96, m_pad] bf16
        if e_hat_t is not None:
            e_hat_t = _pack3(e_hat_t)  # [48, m_pad] bf16
    p_rows = p_hat_t.shape[0]
    e_rows = None if e_hat_t is None else e_hat_t.shape[0]
    buf_dtype = jnp.bfloat16 if packed else jnp.float32

    in_specs = [
        pl.BlockSpec((p_rows, u * chunk), lambda g, *_: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # q̂T stays in HBM
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_chunks, chunk), jnp.float32),
        jax.ShapeDtypeStruct((num_chunks, chunk), jnp.int32),
        jax.ShapeDtypeStruct((num_chunks, _SUBLANES, chunk), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((u, chunk), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u, chunk), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u, _SUBLANES, chunk), lambda g, *_: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # pipelined: depth+3 band slots (bands j-depth..j+2 live) + the
    # (depth+1)-slot staged distance buffer; classic: 2-slot double buffer
    n_slots = (pipe_depth + 3) if pipelined else 2
    dstage = ([pltpu.VMEM((pipe_depth + 1, band, chunk), jnp.float32)]
              if pipelined else [])
    scratch = [
        pltpu.VMEM((n_slots, p_rows, band), buf_dtype),
        *dstage,
        pltpu.SemaphoreType.DMA((n_slots,)),
    ]
    operands = [p_hat_t, q_hat_t]
    if with_extra:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((num_chunks, _SUBLANES, chunk), jnp.float32))
        out_specs.append(pl.BlockSpec((u, _SUBLANES, chunk),
                                      lambda g, *_: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        scratch = [
            pltpu.VMEM((n_slots, p_rows, band), buf_dtype),
            pltpu.VMEM((n_slots, e_rows, band), buf_dtype),
            *dstage,
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ]
        operands = [p_hat_t, q_hat_t, e_hat_t]

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
        matched_e = matched_e.transpose(0, 2, 1).reshape(n_pad, _SUBLANES)[:n, :3]
    else:
        best_d, best_i, matched_q = outs
        matched_e = None

    matched = matched_q.transpose(0, 2, 1).reshape(n_pad, _SUBLANES)[:n, :3]
    dmin = jnp.maximum(best_d.reshape(n_pad)[:n], 0.0)
    if packed_idx:
        # exact distance against the SELECTED target (the in-kernel value
        # lost idx_bits of mantissa to the index splice); the surrogate
        # check runs on the quantized value, where masked/padded band rows
        # still carry their ~1e30 signature (extracted coords there are
        # zeros, which would fake a small distance)
        diff = p - matched
        d_exact = jnp.sum(diff * diff, axis=1)
        dmin = jnp.where(dmin >= _INVALID_SURROGATE * 0.5, dmin, d_exact)
    idx_sorted = jnp.clip(best_i.reshape(n_pad)[:n], 0, m - 1)
    return matched, dmin, idx_sorted, matched_e
