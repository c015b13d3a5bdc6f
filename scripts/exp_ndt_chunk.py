"""Fused-NDT chunk sweep: is a larger chunk the band-traffic lever?

Unlike the morton matcher (whose window is QUALITY-gated — the round-5
geometry study measured w=64 at the quality frontier and larger chunks
slower), the fused NDT window is COVERAGE-exact: _resolve_fused computes
``window >= D + 2S + 128 − chunk/2`` from the concrete voxel table, where
S is the per-chunk query spread in *voxel-rank* units (tiny: the table
has ~#voxels rows, far fewer than points). So doubling the chunk both
amortizes the fixed window over 2× the queries AND shrinks the required
window by chunk/2 — the per-point band ratio ``(chunk+2w+128)/chunk``
drops on both ends. This script measures whether Mosaic's scheduling of
the bigger [band, chunk] tiles eats the saving (it did for morton).

Raw kernel moments are CHUNK-ANCHORED (each chunk's moments live in its
probe-voxel frame), so cross-chunk parity is checked end-to-end instead:
``run_ndt`` at each chunk must recover the same GT transform.

Run on TPU:  python scripts/exp_ndt_chunk.py [n ...]  (default 262144
1048576). Prints one JSON line per (n, chunk).
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

CHUNKS = (512, 1024, 2048)


def scene(n: int):
    rng = np.random.default_rng(0)
    w = int(np.ceil(np.sqrt(n)))
    ax = np.linspace(-2, 2, w, dtype=np.float32)
    xs, ys = np.meshgrid(ax, ax, indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), (xs * xs - ys * ys).ravel()], 1)
    pts = pts[:n] + rng.normal(0, 0.002, (n, 3)).astype(np.float32)
    return np.asarray(pts, np.float32)


def bench(n: int, lo=8, hi=32, repeats=3, voxel=0.12):
    pts = scene(n)
    grid = f.build_ndt_grid(jnp.asarray(pts), voxel)
    jax.block_until_ready(grid.table)
    d1f, d2f = gauss_d1_d2(0.55, voxel)
    src = jnp.asarray(pts)
    src = jnp.take(src, cell_key_order(src, grid), axis=0)
    tables = prepare_fused_tables(grid)
    on_tpu = jax.devices()[0].platform == "tpu"

    for chunk in CHUNKS:
        cfg = _resolve_fused(
            NDTConfig(voxel_size=voxel, lookup="banded", lookup_chunk=chunk),
            grid, pts)
        if cfg.lookup_impl != "pallas" and on_tpu:
            print(json.dumps({"n": n, "chunk": chunk,
                              "note": f"policy fell back to "
                                      f"{cfg.lookup_impl}"}), flush=True)
            continue
        window = cfg.lookup_window

        @jax.jit
        def once(x, g, tb, chunk=chunk, window=window):
            rows, _ = ndt_fused_moments(x, g, tb, voxel_size=voxel,
                                        d1=abs(d1f), d2=d2f,
                                        chunk=chunk, window=window)
            return rows

        try:
            jax.block_until_ready(once(src, grid, tables))
        except Exception as e:  # VMEM OOM etc — a real finding, record it
            print(json.dumps({"n": n, "chunk": chunk, "window": window,
                              "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)
            continue
        # end-to-end GT recovery at this chunk (kernel moments are chunk-
        # anchored, so raw-row comparison across chunkings is meaningless)
        gt = f.gt_transform((0.02, -0.015, 0.01), (0.01, -0.012, 0.008))
        res = f.run_ndt(jnp.asarray(pts), gt.apply(jnp.asarray(pts)),
                        NDTConfig(voxel_size=voxel, lookup="banded",
                                  lookup_chunk=chunk, max_iterations=30))
        gt_err = float(f.transform_rmse(res.transform, gt,
                                        jnp.asarray(pts)))
        rec = {
            "n": n, "chunk": chunk, "window": window,
            "band_ratio": round((chunk + 2 * window + 128) / chunk, 3),
            "gt_err": gt_err, "gt_ok": gt_err < 1e-2,
            "platform": jax.devices()[0].platform,
        }
        if on_tpu:
            def make(iters, chunk=chunk, window=window):
                @jax.jit
                def go(x, g, tb):
                    def step(xc, _):
                        rows, xp = ndt_fused_moments(
                            xc, g, tb, voxel_size=voxel, d1=abs(d1f),
                            d2=d2f, chunk=chunk, window=window)
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
            rec["ms_per_pass"] = round(ms, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [262144, 1048576]
    for n in ns:
        bench(n)
