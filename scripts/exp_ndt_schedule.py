"""A/B fused-NDT kernel variants: schedule (seq vs pipelined depths)
and extraction weight-split (wsplit 2 vs 1).

Schedule (round-5, measured NEGATIVE — BENCH_NOTES §NDT schedule): the
pipelined schedule stages the front half (mask/features/maha) ``depth``
chunks ahead of the back half (weights/extraction/reductions) through
VMEM rings, mirroring the morton band kernel's measured −4–16% win;
here it measured flat-to-slower, so 'auto' resolves to 'seq'.

wsplit: the weighted-extraction matmuls carry w as exact h+m bf16
parts (two K=band MXU passes). wsplit=1 sends a single rounded-bf16 w
— 25% fewer MXU tile-ops and no truncation VPU work, at ~2⁻⁹ relative
moment error.

Prints one JSON line per (n, schedule, wsplit). Run on TPU only.
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

from exp_ndt_mask import scene  # noqa: E402


def bench(n: int, schedule: str, wsplit: int = 2, lo=8, hi=32, repeats=3,
          voxel=0.12):
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
    tables = prepare_fused_tables(grid)

    def make(iters):
        # grid/tables as jit ARGUMENTS (closed-over device arrays bake
        # into the HLO; the tunnel rejects ~50 MB payloads at 1M)
        @jax.jit
        def go(x, g, tb):
            def step(xc, _):
                rows, xp = ndt_fused_moments(
                    xc, g, tb, voxel_size=voxel, d1=abs(d1f), d2=d2f,
                    chunk=chunk, window=window, schedule=schedule,
                    wsplit=wsplit)
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
        "n": n, "schedule": schedule, "wsplit": wsplit,
        "window": window, "chunk": chunk,
        "ms_per_pass": round(ms, 3),
        "platform": jax.devices()[0].platform,
    }), flush=True)
    return ms


if __name__ == "__main__":
    if sys.argv[1:2] == ["--wsplit"]:
        ns = [int(a) for a in sys.argv[2:]] or [262144, 1048576]
        for n in ns:
            for wsplit in (2, 1):
                bench(n, "seq", wsplit=wsplit)
    else:
        ns = [int(a) for a in sys.argv[1:]] or [262144, 1048576]
        for n in ns:
            for schedule in ("seq", "pipe", "pipe2", "auto"):
                bench(n, schedule)
