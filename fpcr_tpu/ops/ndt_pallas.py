"""Fused direct7 NDT band kernel — the whole neighborhood in one pass.

The XLA banded lookup (ops/ndt.py::ndt_lookup_banded) removed the random
row gather, but the direct7 neighborhood still replays it 7× per
iteration (one band compare + one-hot extraction per face offset):
measured 15.5 ms/iteration at 262k on v5e. A first Pallas port of the
per-offset lookup was *slower* (32 ms/iter: its K=8 HIGHEST distance
matmul pays ~6 sequential passes at 8/128 K-utilization). This kernel
dissolves the per-offset structure instead — the TPU-native formulation
of the direct7 field is three MXU matmuls per band chunk:

* **one band per chunk covers all 7 neighbors.** Voxel keys are
  ``cx·2²⁰ + cy·2¹⁰ + cz`` in ascending order, so for surface-like scans
  the face neighbors of a query voxel sit within a few dozen table rows:
  z±1 is ±1 key, y±1 is ~one (cx,cy)-column of rows (1–4 for a
  single-valued surface), and x±1 is ~one x-plane of rows (≈ the cloud
  width in voxels). A ``window`` of 256 rows each side therefore spans
  the whole neighborhood — no per-offset bands, no 7 probes;
* **neighborhood mask on the MXU** (``mask='matmul'``, default): the
  exact pack6 integer-distance matmul ``d(b,q) = |c_b − c_q|²`` in one
  bf16 MXU pass against a [96, m_pad] bf16 ``cellpk`` operand.
  ``mask='vpu'`` instead evaluates the direct7 predicate
  ``Σ|Δc_axis| ≤ 1`` from per-axis cell coordinates riding three free
  lanes of the feature band (integer-exact in f32), dropping the mask
  matmul, the cellpk operand (~200 MB at 1M points) and its band DMA
  stream for ~8 VPU passes. The static argument favored 'vpu'; the
  round-5 hardware A/B (production window 256 / chunk 512) measured the
  opposite — matmul 2.255 vs vpu 2.593 ms/pass @262k, 10.401 vs 11.652
  @1M (BENCH_NOTES §NDT mask A/B): the VPU passes serialize against the
  extraction matmuls while Mosaic overlaps the mask matmul's tile-ops,
  so the MXU form stays the default and both modes remain bit-identical
  (tests/test_ndt.py mode-parity);
* **Mahalanobis distances as one bilinear matmul**: ``q(b,q) =
  (x_q − μ_b)ᵀ S_b (x_q − μ_b)`` expands over band features
  ``[S(6), Sμ′(3), μ′ᵀSμ′]`` × query monomials ``[x′x′(6), −2x′(3), 1]``,
  both sides **anchored to the chunk's probe voxel center** (μ′ = μ − a,
  x′ = x − a): the cancellation scale drops from |x|² (the f32 failure
  ADVICE.md flagged at global-frame coordinates) to the chunk's local
  extent. That extent can still span the cloud's cross-section (chunks
  are voxel-key-contiguous, so one chunk may cover an x-plane), leaving
  expansion terms ~100× larger than q — an h+m split (~2⁻¹⁵ rel) is NOT
  enough once ``exp(−d2/2·q)`` amplifies the error. Operands are
  therefore split h+m+l (truncation split, exact bf16 parts) with the 6
  leading part-pairs kept — K = 96 ≤ 128 is STILL one bf16 MXU pass,
  and the dropped pairs leave ~2⁻²⁴ of the expansion scale (~1e-4 in q);
* **Gauss-Newton moments via weighted extraction**: the robust weight
  ``w = d1 d2 exp(−d2/2 · q) · mask · valid`` becomes the *middle
  matrix* of the extraction matmuls: ``Σ_b w·[S, Sμ′]`` per query, with
  w split h+m so every bf16 product is exact. The per-query moments
  WS (6), WSμ′ (3) are algebraically the complete per-offset sums the
  GN assembly needs: ``Σ_b w S_b r_b = WS·x′ − WSμ′`` (models/ndt.py
  consumes exactly this), so the iteration has NO per-offset loop at
  all — on or off the device.

Per-chunk cost at (chunk=512, window=256): mask + maha + 2 extraction
matmuls, all K ≤ 128 (one MXU pass each) + ~20 VPU passes over
[band, chunk] — measured numbers in BENCH_NOTES §NDT.

Contract identical to ``ndt_lookup_banded``: query rows voxel-key-
coherent (``cell_key_order``); a neighbor voxel whose table row lies
outside the chunk's band contributes nothing (the banded miss
semantics, bounded by ``window``). Moment-level parity with the
explicit 7-offset gather path is asserted in tests (interpret mode)
and on hardware (scripts/tpu_smoke.py).

Reference counterpart: none (the CUDA reference has no NDT); the banded
band/probe structure cites the Morton matcher it generalizes
(ops/morton_pallas.py).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.cloud import padded_chunks, round_up
from .morton_pallas import _pack6
from .ndt import _AXIS_BITS, _KEY_PAD, NDTGrid, _cells_raw, _in_range, _pack

_SUBLANES = 8
_ALIGN = 128
_GROUP = 16          # sublanes per packed slot (bf16 tile height)
_TAB_LANES = 16      # fused table width (ops/ndt.py NDTGrid.table)
_NFEAT = 10          # band features: S(6), Smu'(3), mu'Smu'(1)
_NMONO = 10          # query monomials: x'x'(6), -2x'(3), 1
# h+m+l truncation-split pair layout for the Mahalanobis matmul: kept
# pairs (h,h),(h,m),(m,h),(m,m),(h,l),(l,h); the dropped (m,l)/(l,m)/(l,l)
# terms and the per-operand truncation residual are ~2^-24 of the
# EXPANSION scale — which matters because the bilinear expansion cancels
# ~100× down to q, and exp(−d2/2·q) then amplifies any q error.
_QPARTS = (0, 0, 1, 1, 0, 2)  # query-side part per 16-row group
_BPARTS = (0, 1, 0, 1, 2, 0)  # band-side part per group
_PACKED2 = _GROUP * 6  # 96 rows <= 128: STILL one bf16 MXU pass

# out lanes: 0:6 WS (upper triangle), 6:9 WSmu', 9 unused (mu'Smu'
# extraction byproduct), 10 neighbor count, 11 sum of Mahalanobis q
_LANE_COUNT = 10
_LANE_QSUM = 11


def _trunc_hi(x: jnp.ndarray) -> jnp.ndarray:
    """Top-16-bit truncation of f32 — an EXACTLY bf16-representable part
    (x = hi + (x − hi) with both parts exact in f32). Pure bitwise ops, so
    it lowers inside Mosaic kernels where ``lax.reduce_precision`` and
    rounding casts may not; immune to --xla_allow_excess_precision."""
    bits = lax.bitcast_convert_type(x, jnp.uint32)
    return lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                    jnp.float32)


def _split3_trunc(
        x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(h, m, l) truncation split: h + m + l ≈ x, all exact bf16 parts,
    dropped residual ≤ 2⁻²³·|x| (h and m are exact f32 subtractions, so
    only the final truncation loses bits)."""
    h = _trunc_hi(x)
    r = x - h
    m = _trunc_hi(r)
    return h, m, _trunc_hi(r - m)


class FusedNDTTables(NamedTuple):
    """Per-grid kernel operands (build once, reuse every iteration).

    ``cellpk`` is only built for ``mask='matmul'`` — the default VPU
    neighborhood predicate reads the per-axis cell lanes carried in
    ``tab`` rows 10:13 instead (no second table, no second band DMA)."""

    cellpk: Optional[jnp.ndarray]  # [96, m_pad] bf16 — pack6 of aug. cells
    tab: jnp.ndarray      # [16, m_pad] f32 — [mu−lo(3), S(6), valid,
    #                        cx, cy, cz (1e9 on pad rows), 0…]


def prepare_fused_tables(grid: NDTGrid,
                         mask: str = "matmul") -> FusedNDTTables:
    """Kernel-side tables: the transposed feature table (means re-anchored
    to the grid origin so the in-kernel chunk anchoring stays in small
    coordinates; per-axis cell coordinates in lanes 10:13 for the VPU
    neighborhood predicate) and, for ``mask='matmul'`` only, the
    augmented-cell pack the mask-matmul variant contracts against."""
    if mask not in ("vpu", "matmul"):
        raise ValueError(f"unknown mask {mask!r}")
    m = grid.keys.shape[0]
    m_pad = round_up(m, _ALIGN)
    key = (grid.table[:, 10].astype(jnp.int32) << 15) | \
        grid.table[:, 11].astype(jnp.int32)
    cx = (key >> (2 * _AXIS_BITS)) & ((1 << _AXIS_BITS) - 1)
    cy = (key >> _AXIS_BITS) & ((1 << _AXIS_BITS) - 1)
    cz = key & ((1 << _AXIS_BITS) - 1)
    c = jnp.stack([cx, cy, cz], axis=0).astype(jnp.float32)  # [3, m]
    # pad-sentinel rows must never be neighbors of any real query
    real = grid.keys != jnp.int32(_KEY_PAD)

    cellpk = None
    if mask == "matmul":
        csq = jnp.sum(c * c, axis=0)
        csq = jnp.where(real, csq, 1e9)
        cbT = jnp.zeros((_SUBLANES, m_pad), jnp.float32)
        cbT = cbT.at[:3, :m].set(c)
        cbT = cbT.at[3, :m].set(csq)
        cbT = cbT.at[3, m:].set(1e9)
        cbT = cbT.at[4, :].set(1.0)
        cellpk = _pack6(cbT, 1)  # [96, m_pad] bf16, side 1 = table side

    tabT = jnp.zeros((_TAB_LANES, m_pad), jnp.float32)
    mu_rel = (grid.table[:, 0:3] - grid.lo[None, :]).T  # [3, m]
    tabT = tabT.at[0:3, :m].set(jnp.where(real[None, :], mu_rel, 0.0))
    tabT = tabT.at[3:9, :m].set(grid.table[:, 3:9].T)
    tabT = tabT.at[9, :m].set(grid.table[:, 9])
    # per-axis cells for the VPU predicate: 1e9 on pad-sentinel AND
    # padding rows so they sit far from every real query cell (queries
    # are clamped to ±2²⁰, so every |Δ| here is integer-exact in f32)
    tabT = tabT.at[10:13, :].set(1e9)
    tabT = tabT.at[10:13, :m].set(jnp.where(real[None, :], c, 1e9))
    return FusedNDTTables(cellpk=cellpk, tab=tabT)


def _fused_kernel_pipelined_factory(chunk: int, band: int, unroll: int,
                                    voxel_size: float, d1d2: float,
                                    d2: float, direct7: bool,
                                    vpu_mask: bool, depth: int,
                                    wsplit: int = 2):
    """Software-pipelined fused kernel (``schedule='pipe*'``).

    Same per-chunk math as the sequential kernel below, split into a
    FRONT half (band DMA wait, neighborhood-mask matmul, chunk-anchored
    feature build + h+m+l pack, Mahalanobis matmul) and a BACK half
    (exp weights, weighted-moment extraction matmuls, count/Σq
    reductions, output write), with the front running ``depth`` chunks
    ahead through explicit VMEM rings (``depth + 1`` slots of the
    [band, chunk] q/mask tiles and the [96, band] feature pack). Each
    pipeline step hands Mosaic adjacent INDEPENDENT MXU work (chunk j's
    mask/maha matmuls) and VPU work (chunk j−depth's exp/splits/
    reductions) — the schedule that bought −4–16% on the morton band
    matcher (BENCH_NOTES round-5 pipe A/Bs). Here it measured
    FLAT-TO-SLOWER (10.71 → 10.77/10.81 ms/pass @1M): this kernel has
    no argmin→extract serialization for the staging to break, so it is
    opt-in A/B machinery, not the default. Outputs are bit-identical to
    the sequential schedule (parity test in tests/test_ndt.py)."""
    def kernel(*refs):
        if vpu_mask:
            (bases_ref, pk_ref, cqcell_ref, cqmono_ref,
             tab_hbm, out_ref, tbuf, qring, mring, pring, tsem) = refs
        else:
            (bases_ref, pk_ref, cqcell_ref, cqmono_ref,
             cell_hbm, tab_hbm, out_ref, cbuf, tbuf,
             qring, mring, pring, csem, tsem) = refs
        g = pl.program_id(0)

        if not vpu_mask:
            def c_dma(slot, j):
                base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
                return pltpu.make_async_copy(
                    cell_hbm.at[:, pl.ds(base, band)], cbuf.at[slot],
                    csem.at[slot])

        def t_dma(slot, j):
            base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
            return pltpu.make_async_copy(
                tab_hbm.at[:, pl.ds(base, band)], tbuf.at[slot],
                tsem.at[slot])

        if not vpu_mask:
            c_dma(0, 0).start()
        t_dma(0, 0).start()

        nd = depth + 1
        for j in range(unroll + depth):  # static: straight-line pipeline
            if j < unroll:
                # ---- FRONT: band in, mask + features + maha, staged
                slot = j % 2
                if j + 1 < unroll:
                    if not vpu_mask:
                        c_dma((j + 1) % 2, j + 1).start()
                    t_dma((j + 1) % 2, j + 1).start()
                if not vpu_mask:
                    c_dma(slot, j).wait()
                t_dma(slot, j).wait()

                cols = pl.ds(j * chunk, chunk)
                if not vpu_mask:
                    dc = lax.dot_general(
                        cbuf[slot], cqcell_ref[:, cols],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [band, chunk] exact integer |c_b − c_q|²

                ci = g * unroll + j
                pk = pk_ref[ci]
                axis_mask = (1 << _AXIS_BITS) - 1
                a0 = (((pk >> (2 * _AXIS_BITS)) & axis_mask)
                      .astype(jnp.float32) + 0.5) * voxel_size
                a1 = (((pk >> _AXIS_BITS) & axis_mask)
                      .astype(jnp.float32) + 0.5) * voxel_size
                a2 = ((pk & axis_mask).astype(jnp.float32)
                      + 0.5) * voxel_size
                tab = tbuf[slot]
                mu0 = tab[0] - a0
                mu1 = tab[1] - a1
                mu2 = tab[2] - a2
                s00, s01, s02 = tab[3], tab[4], tab[5]
                s11, s12, s22 = tab[6], tab[7], tab[8]
                valid = tab[9]
                sm0 = s00 * mu0 + s01 * mu1 + s02 * mu2
                sm1 = s01 * mu0 + s11 * mu1 + s12 * mu2
                sm2 = s02 * mu0 + s12 * mu1 + s22 * mu2
                msm = mu0 * sm0 + mu1 * sm1 + mu2 * sm2
                feat = jnp.stack(
                    [s00, s01, s02, s11, s12, s22, sm0, sm1, sm2, msm],
                    axis=0)  # [10, band]
                parts = _split3_trunc(feat)
                zpad = jnp.zeros((_GROUP - _NFEAT, band), jnp.float32)
                pring[j % nd] = jnp.concatenate(
                    [jnp.concatenate([parts[p], zpad], axis=0)
                     for p in _BPARTS], axis=0).astype(jnp.bfloat16)

                qring[j % nd] = lax.dot_general(
                    pring[j % nd], cqmono_ref[:, cols],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [band, chunk] Mahalanobis q

                if vpu_mask:
                    qc = cqcell_ref[:, cols]
                    l1 = (jnp.abs(tab[10][:, None] - qc[0][None, :])
                          + jnp.abs(tab[11][:, None] - qc[1][None, :])
                          + jnp.abs(tab[12][:, None] - qc[2][None, :]))
                    near = l1 < (1.5 if direct7 else 0.5)
                else:
                    near = dc < (1.5 if direct7 else 0.5)
                mring[j % nd] = jnp.where(
                    near, valid[:, None],
                    jnp.zeros((band, chunk), jnp.float32))

            if j >= depth:
                # ---- BACK: weights + extraction for chunk j − depth
                jp = j - depth
                qm = qring[jp % nd]
                maskf = mring[jp % nd]
                pack = pring[jp % nd]
                if d1d2 > 0.0:
                    w = jnp.exp(jnp.minimum(-0.5 * d2 * qm, 0.0)
                                + math.log(d1d2)) * maskf
                else:
                    w = jnp.zeros_like(qm)
                if wsplit == 2:
                    wh32 = _trunc_hi(w)
                    whb = wh32.astype(jnp.bfloat16)
                    wmb = (w - wh32).astype(jnp.bfloat16)
                    ex = (lax.dot_general(
                              pack, whb,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
                          + lax.dot_general(
                              pack, wmb,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
                          )  # [96, chunk]
                else:
                    ex = lax.dot_general(
                        pack, w.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [96, chunk]
                mom = (ex[0:_GROUP] + ex[_GROUP:2 * _GROUP]
                       + ex[4 * _GROUP:5 * _GROUP])  # [16, chunk]

                count = jnp.sum(maskf, axis=0)          # [chunk]
                qsum = jnp.sum(maskf * qm, axis=0)      # [chunk]
                out = jnp.concatenate([
                    mom[0:_LANE_COUNT],
                    count[None, :], qsum[None, :],
                    jnp.zeros((_TAB_LANES - _LANE_QSUM - 1, chunk),
                              jnp.float32),
                ], axis=0)  # [16, chunk]
                out_ref[pl.ds(jp, 1), :, :] = out[None, :, :]

    return kernel


def _fused_kernel_factory(chunk: int, band: int, unroll: int,
                          voxel_size: float, d1d2: float, d2: float,
                          direct7: bool, vpu_mask: bool, wsplit: int = 2):
    def kernel(*refs):
        if vpu_mask:
            (bases_ref, pk_ref, cqcell_ref, cqmono_ref,
             tab_hbm, out_ref, tbuf, tsem) = refs
        else:
            (bases_ref, pk_ref, cqcell_ref, cqmono_ref,
             cell_hbm, tab_hbm, out_ref, cbuf, tbuf, csem, tsem) = refs
        g = pl.program_id(0)

        if not vpu_mask:
            def c_dma(slot, j):
                base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
                return pltpu.make_async_copy(
                    cell_hbm.at[:, pl.ds(base, band)], cbuf.at[slot],
                    csem.at[slot])

        def t_dma(slot, j):
            base = pl.multiple_of(bases_ref[g * unroll + j], _ALIGN)
            return pltpu.make_async_copy(
                tab_hbm.at[:, pl.ds(base, band)], tbuf.at[slot],
                tsem.at[slot])

        if not vpu_mask:
            c_dma(0, 0).start()
        t_dma(0, 0).start()

        for j in range(unroll):  # static unroll — straight-line code
            slot = j % 2
            if j + 1 < unroll:
                if not vpu_mask:
                    c_dma((j + 1) % 2, j + 1).start()
                t_dma((j + 1) % 2, j + 1).start()
            if not vpu_mask:
                c_dma(slot, j).wait()
            t_dma(slot, j).wait()

            cols = pl.ds(j * chunk, chunk)
            if vpu_mask:
                dc = None  # predicate computed below from tab lanes 10:13
            else:
                # ---- neighborhood mask: exact |c_b − c_q|² on the MXU
                dc = lax.dot_general(
                    cbuf[slot], cqcell_ref[:, cols],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [band, chunk] — exact integers (pack6 of 10-bit cells)

            # ---- chunk-anchored band features (VPU, [band] rows).
            # Anchor cell unpacked from the packed probe key IN-KERNEL:
            # a 2-D scalar-prefetch operand pads each row to 128 SMEM
            # lanes (s32[C,3] -> 512 B/chunk, 1 MiB at 1M points — SMEM
            # OOM); the 1-D key is 4 B/chunk.
            ci = g * unroll + j
            pk = pk_ref[ci]
            axis_mask = (1 << _AXIS_BITS) - 1
            a0 = (((pk >> (2 * _AXIS_BITS)) & axis_mask).astype(jnp.float32)
                  + 0.5) * voxel_size
            a1 = (((pk >> _AXIS_BITS) & axis_mask).astype(jnp.float32)
                  + 0.5) * voxel_size
            a2 = ((pk & axis_mask).astype(jnp.float32) + 0.5) * voxel_size
            tab = tbuf[slot]
            mu0 = tab[0] - a0
            mu1 = tab[1] - a1
            mu2 = tab[2] - a2
            s00, s01, s02 = tab[3], tab[4], tab[5]
            s11, s12, s22 = tab[6], tab[7], tab[8]
            valid = tab[9]
            sm0 = s00 * mu0 + s01 * mu1 + s02 * mu2
            sm1 = s01 * mu0 + s11 * mu1 + s12 * mu2
            sm2 = s02 * mu0 + s12 * mu1 + s22 * mu2
            msm = mu0 * sm0 + mu1 * sm1 + mu2 * sm2
            feat = jnp.stack(
                [s00, s01, s02, s11, s12, s22, sm0, sm1, sm2, msm],
                axis=0)  # [10, band]
            parts = _split3_trunc(feat)
            zpad = jnp.zeros((_GROUP - _NFEAT, band), jnp.float32)
            pack = jnp.concatenate(
                [jnp.concatenate([parts[p], zpad], axis=0)
                 for p in _BPARTS], axis=0).astype(jnp.bfloat16)  # [96, band]

            # ---- Mahalanobis q(b, q) in one K=96 bf16 pass
            qm = lax.dot_general(
                pack, cqmono_ref[:, cols],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [band, chunk]

            if vpu_mask:
                # ---- direct7 predicate on the VPU: for integer cells
                # Σ|Δc| ≤ 1 ⟺ |Δc|² ≤ 1 (at most one axis off by one).
                # Per-axis cells ride free lanes of the feature band
                # (pad rows carry 1e9 → never near; clamped out-of-range
                # queries stay integer-exact in f32 at ±2²⁰). Trades the
                # mask matmul's [band, chunk] MXU pass + the cellpk DMA
                # for ~8 VPU passes — measured A/B on hardware
                # (BENCH_NOTES §NDT round 4).
                qc = cqcell_ref[:, cols]  # [8, chunk] f32 raw query cells
                l1 = (jnp.abs(tab[10][:, None] - qc[0][None, :])
                      + jnp.abs(tab[11][:, None] - qc[1][None, :])
                      + jnp.abs(tab[12][:, None] - qc[2][None, :]))
                near = l1 < (1.5 if direct7 else 0.5)
            else:
                # direct7 predicate: d ∈ {0, 1}; direct1: d = 0
                near = dc < (1.5 if direct7 else 0.5)
            maskf = jnp.where(near, valid[:, None],
                              jnp.zeros_like(qm))  # [band, chunk]
            # d1d2 folded into the exponent (one VPU pass saved); no
            # lower clamp — underflow to w=0 IS the right limit (the
            # gather path's −60 floor leaves w ~ 1e−26, far below any
            # parity tolerance)
            if d1d2 > 0.0:
                w = jnp.exp(jnp.minimum(-0.5 * d2 * qm, 0.0)
                            + math.log(d1d2)) * maskf
            else:  # degenerate mixture constants: every weight is zero
                w = jnp.zeros_like(qm)
            # ---- weighted moment extraction: Σ_b w·[S, Sμ'] per query.
            # wsplit=2 (default): w split h (exact bf16 truncation) + m
            # (rounding cast of the residual — any bf16 value is exact as
            # an MXU input; the dropped tail is ≤2⁻¹⁷·w), keeping every
            # bf16 product exact; the feature pack is reused — groups
            # (h)+(m)+(l) reconstruct f to ~2⁻²³. wsplit=1: single
            # rounded-bf16 w matmul — drops one K=band MXU pass (25% of
            # the kernel's tile-ops) and the truncation VPU work for
            # ~2⁻⁹ relative moment error (opt-in, A/B-gated).
            if wsplit == 2:
                wh32 = _trunc_hi(w)
                whb = wh32.astype(jnp.bfloat16)
                wmb = (w - wh32).astype(jnp.bfloat16)
                ex = (lax.dot_general(
                          pack, whb,
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
                      + lax.dot_general(
                          pack, wmb,
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))  # [96, chunk]
            else:
                ex = lax.dot_general(
                    pack, w.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [96, chunk]
            # f = groups 0 (h) + 1 (m) + 4 (l) under _BPARTS
            mom = (ex[0:_GROUP] + ex[_GROUP:2 * _GROUP]
                   + ex[4 * _GROUP:5 * _GROUP])  # [16, chunk]

            count = jnp.sum(maskf, axis=0)          # [chunk]
            qsum = jnp.sum(maskf * qm, axis=0)      # [chunk]
            out = jnp.concatenate([
                mom[0:_LANE_COUNT],
                count[None, :], qsum[None, :],
                jnp.zeros((_TAB_LANES - _LANE_QSUM - 1, chunk), jnp.float32),
            ], axis=0)  # [16, chunk]
            out_ref[pl.ds(j, 1), :, :] = out[None, :, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "d1", "d2", "neighborhood", "chunk",
                     "window", "unroll", "interpret", "mask", "schedule",
                     "wsplit"))
def ndt_fused_moments(
    points: jnp.ndarray,
    grid: NDTGrid,
    tables: FusedNDTTables,
    *,
    voxel_size: float,
    d1: float,
    d2: float,
    neighborhood: str = "direct7",
    chunk: int = 512,
    window: int = 256,
    unroll: int = 8,
    interpret: Optional[bool] = None,
    source_mask: Optional[jnp.ndarray] = None,
    mask: str = "matmul",
    schedule: str = "auto",
    wsplit: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query direct7 GN moments in one kernel pass.

    Returns ``(rows [n, 16], xprime [n, 3])`` where rows lanes are
    ``[WS(6) | WSμ′(3) | · | count | Σq | 0…]`` and ``xprime = x − a`` is
    the query in its chunk's anchor frame (μ′ shares the same anchor, so
    ``Σ_b w S_b r_b = WS·x′ − WSμ′`` exactly — models/ndt.py consumes
    this). ``points`` rows must be voxel-key-coherent (``cell_key_order``).

    ``schedule`` picks the kernel schedule: ``'auto'``/``'seq'``
    (default) is the double-buffered per-chunk chain;
    ``'pipe'``/``'pipe2'``/``'pipe3'`` pin an explicit software-pipeline
    stage depth (front = mask/features/maha, back = weights/extraction,
    staged through VMEM rings — bit-identical outputs, parity-tested).
    The pipeline measured flat-to-slower on hardware at the production
    geometry (BENCH_NOTES §NDT schedule), so unlike the morton matcher
    it is NOT the default — the modes remain for future A/B at other
    geometries.

    ``wsplit`` picks the weight precision of the extraction matmuls:
    2 (default) splits w into exact h+m bf16 parts (two K=band MXU
    passes, moments good to ~2⁻²³); 1 uses a single rounded-bf16 w
    pass — 25% fewer MXU tile-ops and no truncation VPU work, at
    ~2⁻⁹ relative moment error (opt-in; GN convergence is tested but
    strict moment parity vs the gather path is not preserved).
    """
    if neighborhood not in ("direct1", "direct7"):
        raise ValueError(f"unknown neighborhood {neighborhood!r}")
    if mask not in ("vpu", "matmul"):
        raise ValueError(f"unknown mask {mask!r}")
    if schedule not in ("auto", "seq", "pipe", "pipe2", "pipe3"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if wsplit not in (1, 2):
        raise ValueError(f"wsplit must be 1 or 2, got {wsplit!r}")
    if mask == "matmul" and tables.cellpk is None:
        raise ValueError("mask='matmul' needs tables built with "
                         "prepare_fused_tables(grid, mask='matmul')")
    n = points.shape[0]
    x = points.astype(jnp.float32)
    hs = float(voxel_size)
    d1d2 = float(abs(d1)) * float(d2)

    c = _cells_raw(x, grid.lo, hs)
    inb = _in_range(c)
    ok = (source_mask if source_mask is not None
          else jnp.ones((n,), bool))
    # Out-of-range queries stay at their REAL (clamped) cells: a point one
    # cell outside the grid still face-matches its boundary neighbor —
    # the |Δc|² ≤ 1 predicate handles it with no special case (the
    # per-offset path needed `inb` on the SHIFTED cell for this). The
    # ±2²⁰ clamp keeps every packed product exact where it matters; far
    # clamped cells can never sit within distance 1 of a real cell in
    # [0, 1024)³. Masked-out rows (distributed padding) are forced to a
    # structural miss instead.
    cf = jnp.where(ok[:, None],
                   jnp.clip(c, -(1 << 20), 1 << 20).astype(jnp.float32),
                   jnp.float32(-(1 << 11)))

    num_chunks, u = padded_chunks(n, chunk, unroll)
    n_pad = num_chunks * chunk
    num_groups = num_chunks // u

    if mask == "matmul":
        # ---- query cell pack (mask matmul side 0): [-2c, 1, |c|²]
        csq = jnp.sum(cf * cf, axis=1)
        cqT = jnp.zeros((_SUBLANES, n_pad), jnp.float32)
        cqT = cqT.at[4, :].set(1e9)  # padding columns never match
        cqT = cqT.at[:3, :n].set(-2.0 * cf.T)
        cqT = cqT.at[3, :n].set(jnp.where(ok, 1.0, 0.0))
        cqT = cqT.at[4, :n].set(jnp.where(ok, csq, 1e9))
        cqcell = _pack6(cqT, 0)  # [96, n_pad] bf16
    else:
        # ---- raw per-axis query cells for the VPU predicate (padding
        # columns at 1e9 sit far from every band cell → structural miss)
        cqcell = jnp.full((_SUBLANES, n_pad), 1e9, jnp.float32)
        cqcell = cqcell.at[:3, :n].set(cf.T)

    # ---- per-chunk probe rank + anchor cell (clipped key, matching the
    # cell_key_order coherence sort)
    k = jnp.where(ok & inb,
                  _pack(jnp.clip(c, 0, (1 << _AXIS_BITS) - 1)),
                  jnp.int32(-1))
    k_pad = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(k)
    probe = jnp.max(k_pad.reshape(num_chunks, chunk), axis=1)
    ranks = jnp.searchsorted(grid.keys, probe).astype(jnp.int32)

    band = round_up(chunk + 2 * window + _ALIGN, _ALIGN)
    cellpk, tabT = tables.cellpk, tables.tab
    m_pad = tabT.shape[1]  # static — from the operand shape, not data
    if m_pad < band:  # tiny grids: widen so one band fits
        pad = band - m_pad
        if cellpk is not None:
            cellpk = jnp.pad(cellpk, ((0, 0), (0, pad)))
        # padding must keep the cell lanes (10:13) at the far sentinel —
        # zero-padded cells would alias voxel (0,0,0) as a fake neighbor
        tabT = jnp.pad(tabT, ((0, 0), (0, pad)))
        tabT = tabT.at[10:13, m_pad:].set(1e9)
        m_pad = band
    bases = (jnp.clip(ranks - band // 2, 0, m_pad - band)
             & ~jnp.int32(_ALIGN - 1))
    pk = jnp.maximum(probe, 0)
    acell = jnp.stack([
        (pk >> (2 * _AXIS_BITS)) & ((1 << _AXIS_BITS) - 1),
        (pk >> _AXIS_BITS) & ((1 << _AXIS_BITS) - 1),
        pk & ((1 << _AXIS_BITS) - 1),
    ], axis=1).astype(jnp.int32)  # [num_chunks, 3] (host-side xp only)

    # ---- anchored query monomials, h+m+l split pack (maha matmul side 0)
    aoff = (acell.astype(jnp.float32) + 0.5) * jnp.float32(hs)
    x_rel = x - grid.lo[None, :]
    xp_pad = (jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x_rel)
              .reshape(num_chunks, chunk, 3) - aoff[:, None, :]
              ).reshape(n_pad, 3)
    x0, x1, x2 = xp_pad[:, 0], xp_pad[:, 1], xp_pad[:, 2]
    mono = jnp.stack([
        x0 * x0, 2.0 * x0 * x1, 2.0 * x0 * x2,
        x1 * x1, 2.0 * x1 * x2, x2 * x2,
        -2.0 * x0, -2.0 * x1, -2.0 * x2,
        jnp.ones_like(x0),
    ], axis=0)  # [10, n_pad]
    mh = lax.reduce_precision(mono, exponent_bits=8, mantissa_bits=7)
    rm = mono - mh
    mm = lax.reduce_precision(rm, exponent_bits=8, mantissa_bits=7)
    ml = lax.reduce_precision(rm - mm, exponent_bits=8, mantissa_bits=7)
    qparts = (mh, mm, ml)
    zq = jnp.zeros((_GROUP - _NMONO, n_pad), jnp.float32)
    cqmono = jnp.concatenate(
        [jnp.concatenate([qparts[p], zq], axis=0) for p in _QPARTS],
        axis=0).astype(jnp.bfloat16)  # [96, n_pad]

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    vpu_mask = mask == "vpu"

    # ---- schedule selection. The pipelined kernel stages (depth+1)
    # slots of the [band, chunk] q/mask tiles plus the [96, band]
    # feature pack in VMEM rings (`_staged` below); it is opt-in only —
    # the hardware A/B picked the sequential schedule for 'auto' (see
    # the comment on the else branch).
    out_bytes = num_chunks * _TAB_LANES * chunk * 4
    cbuf_bytes = 0 if vpu_mask else 2 * 96 * band * 2
    base_budget = max(
        cbuf_bytes + 2 * _TAB_LANES * band * 4
        + (5 * band * chunk * 4) // 2
        + 4 * (96 * u * chunk * 2) + 2 * u * _TAB_LANES * chunk * 4
        # 2.5 MiB misc headroom: Mosaic's actual scoped need measured
        # 60 KiB past the old 2 MiB term at (band 1408, chunk 512, u 1)
        # on v5e — the wide-plane smoke scene's escalated window
        + 5 * 1024 * 1024 // 2,
        8 * 1024 * 1024)

    def _staged(depth):
        return (depth + 1) * (2 * band * chunk * 4 + _PACKED2 * band * 2)

    if schedule in ("pipe", "pipe2", "pipe3"):
        pipe_depth = {"pipe": 1, "pipe2": 2, "pipe3": 3}[schedule]
    else:  # 'seq' and 'auto': the hardware A/B measured the pipeline
        # FLAT-TO-SLOWER here (seq 10.71 / pipe 10.77 / pipe2 10.81
        # ms/pass @1M, production window 256 chunk 512 — BENCH_NOTES
        # §NDT schedule): unlike the matcher band kernel there is no
        # argmin→extract serialization to break — Mosaic already
        # overlaps the independent unrolled chunks — so staging only
        # adds VMEM traffic. 'auto' therefore resolves to the
        # sequential schedule; pipe modes stay opt-in for A/B.
        pipe_depth = 0

    if pipe_depth:
        kernel = _fused_kernel_pipelined_factory(
            chunk, band, u, hs, d1d2, float(d2),
            neighborhood == "direct7", vpu_mask, pipe_depth, wsplit)
    else:
        kernel = _fused_kernel_factory(chunk, band, u, hs, d1d2, float(d2),
                                       neighborhood == "direct7", vpu_mask,
                                       wsplit)
    in_specs = [
        pl.BlockSpec((cqcell.shape[0], u * chunk), lambda g, *_: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_PACKED2, u * chunk), lambda g, *_: (0, g),
                     memory_space=pltpu.VMEM),
    ]
    ring = ([
        pltpu.VMEM((pipe_depth + 1, band, chunk), jnp.float32),   # qring
        pltpu.VMEM((pipe_depth + 1, band, chunk), jnp.float32),   # mring
        pltpu.VMEM((pipe_depth + 1, _PACKED2, band), jnp.bfloat16),
    ] if pipe_depth else [])
    scratch = [
        pltpu.VMEM((2, _TAB_LANES, band), jnp.float32),
        *ring,
        pltpu.SemaphoreType.DMA((2,)),
    ]
    operands = [cqcell, cqmono]
    if not vpu_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # cell pack, HBM
        scratch.insert(0, pltpu.VMEM((2, 96, band), jnp.bfloat16))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
        operands.append(cellpk)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # feature tab, HBM
    operands.append(tabT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_groups,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((u, _TAB_LANES, chunk), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    # Explicit VMEM budget. Two measured facts drive it (BENCH_NOTES
    # "VMEM pitfall"): (a) XLA promotes the [num_chunks, 16, chunk]
    # output into scoped VMEM whenever it fits the scoped limit, which
    # compile-OOMs together with the kernel's buffers when the output
    # lands just under it (n=259200 → 15.84 MiB → OOM at the default
    # 16 MiB) and runs ~25% SLOWER when funded (33 MiB budget → 3.9 vs
    # 3.1 ms/iter at 262k) — so the budget must stay BELOW the output
    # size to pin it to HBM; (b) Mosaic schedules the [band, chunk] f32
    # temporaries (dc/qm/mask/w/…) within the budget by fusing and
    # freeing — peak live is ~2.5 arrays (an 8 MiB limit compiles and
    # runs at band 1664 where 8 naive temporaries would be 27 MiB).
    # When the escalated window pushes internals past the output size,
    # promotion can't be blocked — fund both instead (correct, slower).
    vmem_budget = base_budget + _staged(pipe_depth) if pipe_depth \
        else base_budget
    if vmem_budget >= out_bytes:
        vmem_budget = min(vmem_budget + out_bytes, 100 * 1024 * 1024)
    (rows,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_chunks, _TAB_LANES, chunk),
                                        jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(bases, pk, *operands)

    rows = rows.transpose(0, 2, 1).reshape(n_pad, _TAB_LANES)[:n]
    return rows, xp_pad[:n]
