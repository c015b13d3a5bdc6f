"""TPU primitive-cost microbenchmarks (sort, gather, searchsorted, dense
distance tiles) — drives matcher design decisions. Run on the TPU."""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, reps=5, tag=""):
    out = fn(*args)
    jax.tree.map(lambda x: float(np.asarray(x).ravel()[0]), out)  # sync
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: float(np.asarray(x).ravel()[0]), out)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"op": tag, "ms": round(min(ts) * 1e3, 3)}), flush=True)


def main():
    rng = np.random.default_rng(0)
    M = 1_000_000
    keys = jnp.asarray(rng.integers(0, 2**31, size=M, dtype=np.int32))
    pts = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    idx1m = jnp.asarray(rng.integers(0, M, size=M, dtype=np.int32))
    idx16m = jnp.asarray(rng.integers(0, M, size=16 * M, dtype=np.int32))

    timeit(jax.jit(jnp.sort), keys, tag="sort_1M_i32")
    timeit(jax.jit(jnp.argsort), keys, tag="argsort_1M_i32")
    timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), pts, idx1m,
           tag="take_rows3_1M")
    timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), pts, idx16m,
           tag="take_rows3_16M")
    # gather from flat layout: [M] per-coordinate
    flat = pts[:, 0]
    timeit(jax.jit(lambda t, i: jnp.take(t, i)), flat, idx16m,
           tag="take_flat_16M")
    skeys = jnp.sort(keys)
    q = jnp.asarray(rng.integers(0, 2**31, size=M, dtype=np.int32))
    timeit(jax.jit(lambda a, b: jnp.searchsorted(a, b)), skeys, q,
           tag="searchsorted_1Mq_1Mt")

    # dense distance+argmin tile rate: [4096, 4096]
    a = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4096, 3)).astype(np.float32))

    @jax.jit
    def dense(a, b):
        d = (jnp.sum(a * a, 1, keepdims=True)
             - 2 * jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.HIGHEST)
             + jnp.sum(b * b, 1)[None, :])
        return jnp.argmin(d, axis=1)

    timeit(dense, a, b, tag="dense_dist_argmin_4096x4096")

    # windowed: map over 256-chunks of sorted source, dynamic_slice target band
    W = 512
    CH = 256

    @jax.jit
    def windowed(p_sorted, t_sorted, bases):
        def per_chunk(args):
            pc, base = args
            band = lax.dynamic_slice(t_sorted, (base, 0), (CH + 2 * W, 3))
            d = (jnp.sum(pc * pc, 1, keepdims=True)
                 - 2 * jax.lax.dot_general(pc, band, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32,
                                           precision=jax.lax.Precision.HIGHEST)
                 + jnp.sum(band * band, 1)[None, :])
            return jnp.argmin(d, 1) + base
        return lax.map(per_chunk, (p_sorted.reshape(-1, CH, 3),
                                   bases)).reshape(-1)

    bases = jnp.clip(jnp.arange(M // CH, dtype=jnp.int32) * CH - W, 0,
                     M - CH - 2 * W)
    timeit(windowed, pts, pts, bases, tag=f"windowed_1M_W{W}")


if __name__ == "__main__":
    main()
