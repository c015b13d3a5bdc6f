"""Round-5 morton band geometry study (VERDICT r4 #5).

The roofline's conclusion for the 1M banded matcher: further wins need
less band traffic per point. Band traffic per source point scales with
``(chunk + 2*window + 128)/chunk`` (the +128 is the Pallas kernel's
lane-alignment slack), so at the production point (c=512, w=64 → 1.50)
the levers are a larger chunk (amortizes window+slack: c=1024/w=64 →
1.25; c=2048/w=32 → 1.09) and a smaller window.

Rank-spread window sizing is a MEASURED NEGATIVE RESULT (round 5, CPU):
the exact-NN rank reach is heavy-tailed (p50 ≈ chunk/2, p99 ≈ 3.6-6.8k,
p99.9 ≥ 32k on the 262k surface/uniform scenes) — no percentile of the
spread justifies ANY affordable window, and the production w=64 already
operates in the miss-absorbing regime (auto_trim + re-matching). So
candidates are instead gated on MATCH QUALITY parity with the production
config (ops/morton.band_quality_probe: scale-aware damaging-miss rate and
mean distance excess) and on end-to-end GT recovery, then slope-timed.

Run on the TPU:  python scripts/exp_morton_band.py [--sizes 512,1024]
(512 → 262,144 pts; 1024 → 1,048,576). Prints one JSON line per
candidate; quality gate runs everywhere, timing numbers only mean
anything on hardware.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import fpcr_tpu as f  # noqa: E402
from fpcr_tpu.ops.morton import (band_quality_probe,  # noqa: E402
                                 build_morton_table, source_morton_order)

CANDIDATES = (
    (512, 64),    # production baseline (r2 winner: 4.79 ms/iter @1M)
    (512, 32),
    (512, 16),
    (1024, 64),
    (1024, 32),
    (1024, 16),
    (2048, 32),
)


def slope_time(make_run, src, tgt, lo=5, hi=25, repeats=3):
    eps = np.float32(1e-7)
    run_lo, run_hi = make_run(lo), make_run(hi)

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

    t_lo, t_hi = timed(run_lo), timed(run_hi)
    ms = (t_hi - t_lo) * 1e3 / (hi - lo)
    return ms if ms > 0 else t_hi * 1e3 / hi


def study(width: int, time_it: bool) -> None:
    scene = f.synthetic_scene(width=width)
    n = scene.source.shape[0]
    gt = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    src = jax.device_put(scene.source)
    tgt = jax.device_put(gt.apply(scene.source))

    table = build_morton_table(tgt)
    p_sorted = jnp.take(src, source_morton_order(src, table), axis=0)

    base_q = None
    for chunk, window in CANDIDATES:
        q = band_quality_probe(p_sorted, table, chunk=chunk, window=window)
        if (chunk, window) == CANDIDATES[0]:
            base_q = q
        # quality gate: damaging rate and mean excess within 1.5x + eps of
        # the production baseline's (absolute floors absorb zero baselines)
        ok = (q["damaging_rate"] <= base_q["damaging_rate"] * 1.5 + 2e-3
              and q["mean_excess_rel"] <= base_q["mean_excess_rel"] * 1.5
              + 1e-4)
        rec = dict(q, n=n, quality_ok=bool(ok))
        if ok:
            def make_run(iters, chunk=chunk, window=window):
                cfg = f.ICPConfig(matcher="morton", max_iterations=iters,
                                  tolerance=0.0, morton_chunk=chunk,
                                  morton_window=window)
                def run(s, t):
                    return f.run_icp(s, t, cfg)
                float(run(src, tgt).errors[-1])  # compile+warm
                return run
            res = make_run(15)(src, tgt)
            rec["gt_err"] = float(f.transform_rmse(res.transform, gt, src))
            rec["gt_ok"] = rec["gt_err"] < 1e-4
            if time_it and rec["gt_ok"]:
                rec["ms_per_iter"] = round(slope_time(make_run, src, tgt), 4)
        print(json.dumps(rec), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024",
                    help="comma-separated grid widths (n = width²)")
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        print(json.dumps({"note": "not on TPU: quality gates only, "
                                  "timings suppressed"}), flush=True)
    for w in (int(x) for x in args.sizes.split(",")):
        study(w, time_it=on_tpu)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
