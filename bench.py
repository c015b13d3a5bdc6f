"""Headline benchmark: point-to-point ICP ms/iteration at N=16,384.

Reference baseline (BASELINE.md): 6.4944 ms per ICP iteration at N=16,384 on
an RTX 2060 (src/CUDA/csv_files/GPU_ICP_point_to_point_TimeComp.csv), the
reference's own headline number. This script times the same workload — full
iterations (matching + Kabsch solve + transform + error) on the synthetic
128x128 z=x²-y² scene — on the TPU chip and prints ONE JSON line:

    {"metric": ..., "value": <ms/iter>, "unit": "ms",
     "vs_baseline": <value / 6.4944>}   # < 1.0 means faster than the ref GPU

Timing policy mirrors the reference's microbenches: fixed iteration count
compiled as one program (tolerance=0 disables early exit), min over repeats
(Matching_opt.cu:213-226 uses min-of-10).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_MS_PER_ITER_16384 = 6.4944  # RTX 2060, reference CSV


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--width", type=int, default=128, help="grid width (N=width²)")
    parser.add_argument("--iters", type=int, default=20, help="ICP iterations per run")
    parser.add_argument("--repeats", type=int, default=5, help="timed repeats (min taken)")
    args = parser.parse_args()
    if args.width < 2 or args.iters < 1 or args.repeats < 1:
        parser.error("--width must be >= 2, --iters/--repeats >= 1")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import fpcr_tpu as f

    n = args.width * args.width
    scene = f.synthetic_scene(width=args.width)
    # tolerance=0 → the loop never converges early → exactly `iters` iterations,
    # so wall/iters is the true steady-state per-iteration cost.
    config = f.ICPConfig(max_iterations=args.iters, tolerance=0.0)

    source = jax.device_put(scene.source)
    target = jax.device_put(scene.target)

    # compile + warm up
    res = f.run_icp(source, target, config)
    jax.block_until_ready(res.errors)

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        res = f.run_icp(source, target, config)
        jax.block_until_ready(res.errors)
        times.append(time.perf_counter() - t0)

    ms_per_iter = min(times) * 1e3 / args.iters
    platform = jax.devices()[0].platform

    details = {
        "platform": platform,
        "n_points": n,
        "iters": args.iters,
        "repeats": args.repeats,
        "all_ms_per_iter": [t * 1e3 / args.iters for t in times],
        "final_error": float(res.errors[args.iters - 1]),
        "baseline": {
            "ms_per_iter": BASELINE_MS_PER_ITER_16384,
            "hardware": "RTX 2060",
            "source": "GPU_ICP_point_to_point_TimeComp.csv row 16384",
        },
    }
    print(json.dumps(details), file=sys.stderr)

    print(json.dumps({
        "metric": f"icp_point_to_point_ms_per_iter_n{n}",
        "value": round(ms_per_iter, 4),
        "unit": "ms",
        "vs_baseline": round(ms_per_iter / BASELINE_MS_PER_ITER_16384, 4),
    }))


if __name__ == "__main__":
    main()
