"""NDT per-iteration cost on TPU: gather vs banded voxel-row lookup.

VERDICT r2 #6: the gather lookup was the framework's one badly-scaling op
(82.4 ms/iter at 262k). This script times the full NDT Gauss-Newton loop
(direct7 neighborhood) with both lookup strategies, slope-timed like
bench.py (defeats tunnel RPC overhead + server-side memoization), grid
prebuilt (the one-time voxelization prepass is excluded — it is the same
for both strategies). Prints one JSON line per (n, lookup); pass
``--csv PATH`` to also append ``n,lookup,impl,ms_per_iter`` rows (the
committed artifact: bench_results/ndt_tpu.csv).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import fpcr_tpu as f  # noqa: E402
from fpcr_tpu.models.ndt import NDTConfig, run_ndt  # noqa: E402


def bench(n: int, lookup: str, lo=4, hi=16, repeats=3, chunk=512,
          window=None, impl="auto", csv=None):
    rng = np.random.default_rng(0)
    # surface-like cloud (z = x^2 - y^2 saddle + noise) so voxel occupancy
    # resembles a scan, not a solid volume
    w = int(np.ceil(np.sqrt(n)))  # w*w >= n so the slice is exactly n rows
    ax = np.linspace(-2, 2, w, dtype=np.float32)
    xs, ys = np.meshgrid(ax, ax, indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), (xs * xs - ys * ys).ravel()], 1)
    pts = pts[:n] + rng.normal(0, 0.002, (n, 3)).astype(np.float32)
    src = jax.device_put(np.asarray(pts, np.float32))
    gt = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    tgt = jax.device_put(gt.apply(src))

    grid = f.build_ndt_grid(tgt, 0.12)
    jax.block_until_ready(grid.table)

    def make(iters):
        cfg = NDTConfig(voxel_size=0.12, max_iterations=iters, tolerance=0.0,
                        lookup=lookup, lookup_chunk=chunk,
                        lookup_window=window, lookup_impl=impl)

        def run(s):
            return run_ndt(s, tgt, cfg, grid=grid)

        float(run(src).errors[0])  # compile + warm
        return run

    run_lo, run_hi = make(lo), make(hi)
    eps = np.float32(1e-7)

    def timed(fn):
        ts = []
        for k in range(repeats):
            s = src + eps * (k + 1)
            float(s[0, 0])
            t0 = time.perf_counter()
            out = fn(s)
            float(out.errors[0])  # real sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(run_lo), timed(run_hi)
    ms = (t_hi - t_lo) * 1e3 / (hi - lo)
    res = run_hi(src)
    print(json.dumps({
        "n": n, "lookup": lookup, "impl": impl, "ms_per_iter": round(ms, 3),
        "matched_fraction": round(float(res.matched_fraction), 4),
        "err0": float(res.errors[0]),
        "platform": jax.devices()[0].platform,
    }), flush=True)
    if csv:
        with open(csv, "a") as fh:
            fh.write(f"{n},{lookup},{impl},{ms:.3f}\n")


if __name__ == "__main__":
    args = sys.argv[1:]
    csv = None
    if "--csv" in args:
        i = args.index("--csv")
        if i + 1 >= len(args):
            raise SystemExit("usage: bench_ndt.py [sizes...] --csv PATH")
        csv = args[i + 1]
        del args[i:i + 2]
        with open(csv, "w") as fh:
            fh.write("n,lookup,impl,ms_per_iter\n")
    sizes = args or ["16384", "262144"]
    for s in sizes:
        n = int(s)
        # the fused kernel is fast enough that a short slope window sits
        # inside the tunnel RPC noise floor at EVERY size; widen the
        # window so the subtraction resolves it (same practice as
        # scripts/tpu_sweep.py after VERDICT r2 "weak" #1)
        hi = 128 if n <= 65536 else (64 if n <= 262144 else 32)
        if n <= 262144:
            bench(n, "gather", hi=hi, csv=csv)
        bench(n, "banded", impl="xla", hi=hi, csv=csv)
        bench(n, "banded", impl="pallas", hi=hi, csv=csv)
