"""Experiment: reduction variants on top of the packed6 bf16 matmul.

Round-2 found the HIGHEST kernel MXU-bound (packed-int reduction didn't
move it). packed6 cut the MXU cost ~6x, so the kernel is now likely
REDUCTION-bound — re-test the single-pass packed-int reduction (quantized
distance bits | lane index, one int min instead of min+argmin) against the
current two-reduce kernel, plus a min-only lower bound.

Run on TPU: python scripts/exp_packed_reduction.py [n]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fpcr_tpu.ops.matching_pallas import _augment, _split3  # noqa: E402

INTERPRET = jax.devices()[0].platform != "tpu"


def round_up(x, k):
    return (x + k - 1) // k * k


def _packed6_inputs(p, q, n_pad, m_pad):
    p_hat, qT = _augment(p, q, None, n_pad, m_pad)
    ph, pm, plo = _split3(p_hat)
    qh, qm, qlo = _split3(qT)
    pairs = [(ph, qh), (ph, qm), (pm, qh), (ph, qlo), (plo, qh), (pm, qm)]
    p_in = jnp.concatenate([a for a, _ in pairs], axis=1)  # [n, 48]
    q_in = jnp.concatenate([b for _, b in pairs], axis=0)  # [48, m]
    return p_in, q_in


def _kern_pint(idx_bits, p_ref, qT_ref, best_ref):
    """One int min: (clamped distance bits & ~mask) | global lane idx."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, jnp.int32(0x7FFFFFFF))

    d = jax.lax.dot_general(
        p_ref[:], qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bm = qT_ref.shape[1]
    d = jnp.maximum(d, 0.0)  # negative rounding noise would flip the sign bit
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    mask = jnp.int32(~((1 << idx_bits) - 1))
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * bm
    packed = (bits & mask) | iota
    local = jnp.min(packed, axis=1)[:, None]
    best_ref[:] = jnp.minimum(best_ref[:], local)


def _kern_min(p_ref, qT_ref, best_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)

    d = jax.lax.dot_general(
        p_ref[:], qT_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    best_ref[:] = jnp.minimum(best_ref[:], jnp.min(d, axis=1)[:, None])


def make_pint(bn, bm):
    @jax.jit
    def run(p, q):
        n, m = p.shape[0], q.shape[0]
        n_pad, m_pad = round_up(n, bn), round_up(m, bm)
        idx_bits = max(1, int(m_pad - 1).bit_length())
        p_in, q_in = _packed6_inputs(p, q, n_pad, m_pad)
        grid = (n_pad // bn, m_pad // bm)
        best = pl.pallas_call(
            functools.partial(_kern_pint, idx_bits),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bn, 48), lambda i, j: (i, 0)),
                pl.BlockSpec((48, bm), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=INTERPRET,
        )(p_in, q_in)
        idx = best[:n, 0] & jnp.int32((1 << idx_bits) - 1)
        qm = q[idx]
        d = jnp.sum((p - qm) ** 2, axis=1)  # exact winner distance
        return idx, d

    return run


def make_minonly(bn, bm):
    @jax.jit
    def run(p, q):
        n, m = p.shape[0], q.shape[0]
        n_pad, m_pad = round_up(n, bn), round_up(m, bm)
        p_in, q_in = _packed6_inputs(p, q, n_pad, m_pad)
        grid = (n_pad // bn, m_pad // bm)
        best = pl.pallas_call(
            _kern_min,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bn, 48), lambda i, j: (i, 0)),
                pl.BlockSpec((48, bm), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=INTERPRET,
        )(p_in, q_in)
        return jnp.zeros((n,), jnp.int32), best[:n, 0]

    return run


def make_current():
    from fpcr_tpu.ops.matching_pallas import nn_argmin_pallas
    return jax.jit(lambda p, q: nn_argmin_pallas(p, q))


def make_looped(run_fn):
    @jax.jit
    def looped(p, q, k):
        def body(i, acc):
            pi = p.at[0, 0].add(1e-30 * jnp.float32(i))
            idx, d = run_fn(pi, q)
            return acc + d[-1] + jnp.float32(idx[-1])
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    return looped


def slope_time(run_fn, p, q, k_lo=2, k_hi=12, repeats=5):
    looped = make_looped(run_fn)
    float(looped(p, q, k_lo))
    float(looped(p, q, k_hi))
    lo_best = hi_best = np.inf
    for r in range(repeats):
        pr = p + np.float32(1e-7 * (r + 1))
        t0 = time.perf_counter()
        float(looped(pr, q, k_lo))
        lo_best = min(lo_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(looped(pr, q, k_hi))
        hi_best = min(hi_best, time.perf_counter() - t0)
    return (hi_best - lo_best) * 1e3 / (k_hi - k_lo)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    p = jnp.asarray(
        (np.asarray(q) + rng.normal(scale=0.3, size=(n, 3))).astype(np.float32))

    ref = make_current()
    idx_ref, d_ref = ref(p, q)

    variants = {
        "current(argmin+min)": ref,
        "pint bn512 bm8192": make_pint(512, 8192),
        "pint bn512 bm4096": make_pint(512, 4096),
        "pint bn1024 bm8192": make_pint(1024, 8192),
        "pint bn2048 bm8192": make_pint(2048, 8192),
        "minonly bn512 bm8192": make_minonly(512, 8192),
    }
    for name, fn in variants.items():
        idx, d = fn(p, q)
        agree = float((idx == idx_ref).mean()) if "minonly" not in name else -1
        ms = slope_time(fn, p, q)
        print(f"{name}: {ms:.3f} ms  idx-agree {agree:.5f}", flush=True)


if __name__ == "__main__":
    main()
