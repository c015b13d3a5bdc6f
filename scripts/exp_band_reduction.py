"""Round-5 band-kernel reduction A/B: packed6 vs packed6_idx.

The roofline puts the 1M band matcher at MXU ≈ VPU balanced with a
sequential per-chunk VPU→MXU dependency (argmin must finish before the
one-hot extraction starts). ``mode='packed6_idx'`` collapses the two
VPU reduction passes (argmin + min over every [band, chunk] tile) into
ONE int32 min over packed (value|index) words — the same trick the
brute matcher's round-5 ablation measured at its kernel floor
(scripts/exp_reduction2.py). This script measures whether it moves the
full-ICP per-iteration number at the production geometry (c=512, w=64).

Run on the TPU:  python scripts/exp_band_reduction.py [--sizes 512,1024]
Prints one JSON line per (n, mode) with GT recovery asserted first.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import fpcr_tpu as f  # noqa: E402

MODES = ("packed6", "packed6_idx")  # default; override with --modes


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


def study(width: int, time_it: bool, modes=MODES) -> None:
    scene = f.synthetic_scene(width=width)
    n = scene.source.shape[0]
    gt = f.gt_transform((0.004, -0.002, 0.003), (0.002, -0.003, 0.002))
    src = jax.device_put(scene.source)
    tgt = jax.device_put(gt.apply(scene.source))

    for mode in modes:
        def make_run(iters, mode=mode):
            # production band geometry (c=512/w=64): the committed-ladder
            # config and the round-5 geometry study's measured frontier
            cfg = f.ICPConfig(matcher="morton", max_iterations=iters,
                              tolerance=0.0, pallas_mode=mode,
                              morton_chunk=512, morton_window=64)
            def run(s, t):
                return f.run_icp(s, t, cfg)
            float(run(src, tgt).errors[-1])  # compile+warm
            return run

        res = make_run(15)(src, tgt)
        rec = {
            "n": n,
            "mode": mode,
            "gt_err": float(f.transform_rmse(res.transform, gt, src)),
        }
        rec["gt_ok"] = rec["gt_err"] < 1e-4
        if time_it and rec["gt_ok"]:
            rec["ms_per_iter"] = round(slope_time(make_run, src, tgt), 4)
        print(json.dumps(rec), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024",
                    help="comma-separated grid widths (n = width²)")
    ap.add_argument("--modes", default=",".join(MODES),
                    help="comma-separated pallas_mode values to A/B")
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        print(json.dumps({"note": "not on TPU: GT gates only, timings "
                                  "suppressed"}), flush=True)
    for w in (int(x) for x in args.sizes.split(",")):
        study(w, time_it=on_tpu, modes=tuple(args.modes.split(",")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
