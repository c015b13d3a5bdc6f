"""Large-N scaling benchmark: grid-matched ICP per-iteration cost on TPU.

Targets the BASELINE.json north star: <10 ms per ICP iteration at 1M points
per chip (the brute-force reference caps at 16k: 6.49 ms on RTX 2060).
Prints one JSON line per size. Run on the TPU (no args) — slope-timed like
bench.py (defeats tunnel RPC overhead + server-side result memoization).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import fpcr_tpu as f  # noqa: E402


def slope_time(run_lo, run_hi, src, tgt, lo, hi, repeats=3):
    eps = np.float32(1e-7)

    def timed(fn):
        ts = []
        for k in range(repeats):
            s = src + eps * (k + 1)
            t = tgt + eps * (k + 1)
            float(s[0, 0]); float(t[0, 0])
            t0 = time.perf_counter()
            out = fn(s, t)
            float(out.errors[-1])  # real sync through the tunnel
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo = timed(run_lo)
    t_hi = timed(run_hi)
    return (t_hi - t_lo) * 1e3 / (hi - lo)


def bench_size(width: int, matcher: str, lo=5, hi=25, cap=12, window=512,
               chunk=256, unroll=8):
    scene = f.synthetic_scene(width=width)
    n = scene.source.shape[0]
    # near-registered regime (the per-iteration cost measurement; the
    # coarse stage handles large displacements — see models/pipeline.py)
    gt = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    src = jax.device_put(scene.source)
    tgt = jax.device_put(gt.apply(scene.source))

    def make(iters):
        cfg = f.ICPConfig(matcher=matcher, max_iterations=iters,
                          tolerance=0.0, grid_cap=cap,
                          morton_window=window, morton_chunk=chunk,
                          morton_unroll=unroll,
                          source_chunk=65536 if matcher == "grid" else 2048)
        def run(s, t):
            return f.run_icp(s, t, cfg)
        float(run(src, tgt).errors[-1])  # compile+warm
        return run

    run_lo, run_hi = make(lo), make(hi)
    ms = slope_time(run_lo, run_hi, src, tgt, lo, hi)
    res = run_hi(src, tgt)
    print(json.dumps({
        "n": int(n), "matcher": matcher, "ms_per_iter": round(ms, 4),
        "final_err": float(res.errors[hi - 1]),
        "platform": jax.devices()[0].platform,
    }), flush=True)
    return ms


if __name__ == "__main__":
    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "morton"
    if which == "grid":
        # NOTE: grid at 1M crashed the TPU worker in this environment
        # (gather pressure); the morton matcher is the supported 1M path.
        bench_size(128, "grid")
        bench_size(512, "grid")
    else:
        bench_size(128, "morton")    # 16,384
        bench_size(512, "morton", window=64, chunk=512, unroll=8)  # 262,144
        # packed6 band-kernel winner (r2): 4.79 ms/iter at 1M
        bench_size(1024, "morton", window=64, chunk=512, unroll=8)
        bench_size(1024, "morton", window=128, chunk=512, unroll=8)
        bench_size(1024, "morton", window=256, unroll=16)
