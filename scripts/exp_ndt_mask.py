"""A/B the fused-NDT neighborhood predicate: mask='vpu' vs 'matmul'.

Round-4 kernel change (ops/ndt_pallas.py): the direct7 predicate moved
from a dedicated [band, chunk] MXU pass (pack6 integer-distance matmul,
~25% of the kernel's MXU tile-ops at window 384) to ~8 VPU passes over
per-axis cell lanes of the feature band. Which side wins depends on
whether the kernel is MXU- or VPU-bound at the production shapes — this
script measures the standalone kernel both ways, slope-timed (tunnel RPC
+ memoization discipline, see docs/performance.md), on the bench_ndt
scene (voxel 0.12, auto-resolved window).

Prints one JSON line per (n, mask). Run on TPU only (interpret mode on
CPU tells you nothing about the MXU/VPU balance).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import fpcr_tpu as f  # noqa: E402
from fpcr_tpu.models.ndt import NDTConfig, _resolve_fused  # noqa: E402
from fpcr_tpu.ops.ndt import cell_key_order, gauss_d1_d2  # noqa: E402
from fpcr_tpu.ops.ndt_pallas import (  # noqa: E402
    ndt_fused_moments, prepare_fused_tables)


def scene(n: int):
    rng = np.random.default_rng(0)
    w = int(np.ceil(np.sqrt(n)))
    ax = np.linspace(-2, 2, w, dtype=np.float32)
    xs, ys = np.meshgrid(ax, ax, indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), (xs * xs - ys * ys).ravel()], 1)
    pts = pts[:n] + rng.normal(0, 0.002, (n, 3)).astype(np.float32)
    return np.asarray(pts, np.float32)


def bench(n: int, mask: str, lo=8, hi=32, repeats=3, voxel=0.12):
    pts = scene(n)
    grid = f.build_ndt_grid(jnp.asarray(pts), voxel)
    jax.block_until_ready(grid.table)
    cfg = _resolve_fused(
        NDTConfig(voxel_size=voxel, lookup="banded", lookup_chunk=512),
        grid, pts)
    window, chunk = cfg.lookup_window, cfg.lookup_chunk
    d1f, d2f = gauss_d1_d2(0.55, voxel)
    src = jnp.asarray(pts)
    src = jnp.take(src, cell_key_order(src, grid), axis=0)
    tables = prepare_fused_tables(grid, mask=mask)

    def make(iters):
        # grid/tables must be jit ARGUMENTS: closed-over device arrays
        # bake into the HLO as constants and the tunnel's remote_compile
        # rejects the ~50 MB payload at 1M points (HTTP 413)
        @jax.jit
        def go(x, g, tb):
            def step(xc, _):
                rows, xp = ndt_fused_moments(
                    xc, g, tb, voxel_size=voxel, d1=abs(d1f), d2=d2f,
                    chunk=chunk, window=window, mask=mask)
                # serialize iterations: thread a value-preserving
                # dependency on the kernel output into the next input
                return xc + 0.0 * rows[0, 0], rows[0, 10]
            y, outs = jax.lax.scan(step, x, None, length=iters)
            return outs[-1]
        fn = lambda x: go(x, grid, tables)  # noqa: E731
        float(fn(src))  # compile + warm
        return fn

    run_lo, run_hi = make(lo), make(hi)
    eps = np.float32(1e-7)

    def timed(fn):
        ts = []
        for k in range(repeats):
            s = src + eps * (k + 1)
            float(s[0, 0])
            t0 = time.perf_counter()
            float(fn(s))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (timed(run_hi) - timed(run_lo)) * 1e3 / (hi - lo)
    print(json.dumps({
        "n": n, "mask": mask, "window": window, "chunk": chunk,
        "ms_per_pass": round(ms, 3),
        "platform": jax.devices()[0].platform,
    }), flush=True)
    return ms


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [262144, 1048576]
    for n in ns:
        for mask in ("vpu", "matmul"):
            bench(n, mask)
