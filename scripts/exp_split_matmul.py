"""Experiment: K-packed multi-bf16 distance matmuls vs the shipped
HIGHEST-precision kernel at N=M=16,384.

Insight: an MXU pass costs the same for any contraction depth K <= 128,
and the augmented distance matmul only uses K=8. XLA's HIGHEST f32 matmul
runs ~6 SEQUENTIAL bf16 passes (6x the time). But the same 6 bf16x6 term
pairs can be laid out ALONG K: with the triple split x = h + m + l
(8+8+8 mantissa bits, exact for f32) the kept products
(h,h'),(h,m'),(m,h'),(h,l'),(l,h'),(m,m') become one K=48 bf16 matmul —
f32-grade accuracy at one-pass cost. 'x3' keeps only the first three
pairs (K=24, ~2^-16 relative error).

Variants:
  ref   shipped kernel (dot_general HIGHEST, K=8)
  x6    K=48 packed bf16 (f32-equivalent precision)
  x3    K=24 packed bf16 (bf16x3-grade precision)

Run on the real TPU:  python scripts/exp_split_matmul.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fpcr_tpu as f
from fpcr_tpu.core.cloud import round_up
from fpcr_tpu.ops.matching_pallas import _augment, nn_argmin_pallas
from fpcr_tpu.utils.timing import slope_benchmark

_LANES = 8


def _packed_kernel(p_ref, qT_ref, best_d_ref, best_i_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d_ref[:] = jnp.full_like(best_d_ref, jnp.inf)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    d = jax.lax.dot_general(
        p_ref[:], qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None]
    local_min = jnp.min(d, axis=1)[:, None]
    bm = qT_ref.shape[1]
    global_arg = j * bm + local_arg
    better = local_min < best_d_ref[:]
    best_d_ref[:] = jnp.where(better, local_min, best_d_ref[:])
    best_i_ref[:] = jnp.where(better, global_arg, best_i_ref[:])


# the ONE library implementation of the reduce_precision triple-bf16
# split — a local copy would silently measure stale semantics if the
# library version is tuned (exp_packed_reduction.py imports it the same way)
from fpcr_tpu.ops.matching_pallas import _split3  # noqa: E402


@functools.partial(jax.jit, static_argnames=("block_n", "block_m", "terms"))
def nn_argmin_packed(p, q, *, block_n=256, block_m=8192, terms=6):
    n, m = p.shape[0], q.shape[0]
    bn = min(block_n, round_up(n, 8))
    bm = min(block_m, round_up(m, 128))
    n_pad = round_up(n, bn)
    m_pad = round_up(m, bm)
    p_hat, qT = _augment(p, q, None, n_pad, m_pad)

    ph, pm, plo = _split3(p_hat)
    qh, qm, qlo = _split3(qT)
    # kept bf16x6 term pairs, biggest first; x3 keeps the first three
    pairs = [(ph, qh), (ph, qm), (pm, qh), (ph, qlo), (plo, qh), (pm, qm)]
    pairs = pairs[:terms]
    p_cat = jnp.concatenate([a for a, _ in pairs], axis=1)  # [n, 8*terms]
    q_cat = jnp.concatenate([b for _, b in pairs], axis=0)  # [8*terms, m]
    kk = _LANES * terms

    grid = (n_pad // bn, m_pad // bm)
    best_d, best_i = pl.pallas_call(
        _packed_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, kk), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, bm), lambda i, j: (0, j),
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
        interpret=jax.devices()[0].platform != "tpu",
    )(p_cat, q_cat)
    return best_i[:n, 0], jnp.maximum(best_d[:n, 0], 0.0)


def main():
    scene = f.synthetic_scene(width=128)
    src = jax.device_put(scene.source)
    tgt = jax.device_put(scene.target)

    from fpcr_tpu.ops.matching import gather_correspondences

    near = f.run_icp(src, tgt, f.ICPConfig(max_iterations=12)).points
    for terms in (6, 3):
        for tag, p in (("far", src), ("near", near)):
            i_ref, d_ref = nn_argmin_pallas(p, tgt)
            i_sp, d_sp = nn_argmin_packed(p, tgt, terms=terms)
            mism = int(jnp.sum(i_ref != i_sp))
            q_ref = gather_correspondences(tgt, i_ref)
            q_sp = gather_correspondences(tgt, i_sp)
            worse = (jnp.sum((p - q_sp) ** 2, axis=1)
                     - jnp.sum((p - q_ref) ** 2, axis=1))
            print(f"x{terms} {tag}: mism {mism}/{p.shape[0]}, "
                  f"max extra sqdist {float(jnp.max(worse)):.3e}, "
                  f"max |d err| {float(jnp.max(jnp.abs(d_sp - d_ref))):.3e}")

    def run_ref(x):
        return nn_argmin_pallas(x, tgt)[1]

    print(f"ref HIGHEST: {slope_benchmark(run_ref, src):.3f} ms")
    for terms in (6, 3):
        for bn in (256, 512):
            def run_b(x, terms=terms, bn=bn):
                return nn_argmin_packed(x, tgt, terms=terms, block_n=bn)[1]
            print(f"x{terms} bn={bn}: {slope_benchmark(run_b, src):.3f} ms")


if __name__ == "__main__":
    main()
