"""Experiment: where does the non-matching ~1 ms of the 16,384-pt ICP
iteration go, and which solver/config wins on TPU?

Times fixed-iteration (tolerance=0) full loops via the slope method for:
  svd       — jnp.linalg.svd Kabsch (current default)
  polar     — Newton–Schulz polar-decomposition Kabsch (no SVD)
  svd+xla   — XLA brute matcher control
(the matching share is isolated by diffing against the kernel-only
numbers from scripts/exp_match_kernels.py, not by a match-only loop)

Run on TPU: python scripts/exp_loop_body.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fpcr_tpu as f


def time_loop(cfg, scene, lo=10, hi=60, repeats=5):
    # two static configs (lo/hi iteration caps), one executable each;
    # slope cancels dispatch/augment/one-time costs
    c_lo = f.ICPConfig(**{**cfg, "tolerance": 0.0, "max_iterations": lo})
    c_hi = f.ICPConfig(**{**cfg, "tolerance": 0.0, "max_iterations": hi})
    r_lo = jax.jit(lambda s, t: f.run_icp(s, t, c_lo).errors)
    r_hi = jax.jit(lambda s, t: f.run_icp(s, t, c_hi).errors)
    float(r_lo(scene.source, scene.target)[0])
    float(r_hi(scene.source, scene.target)[0])
    best_lo = best_hi = float("inf")
    for r in range(repeats):
        s = scene.source + np.float32(1e-6 * (r + 1))
        t0 = time.perf_counter()
        float(r_lo(s, scene.target)[0])
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(r_hi(s, scene.target)[0])
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (hi - lo) * 1e3


def main():
    scene = f.synthetic_scene(width=128)
    results = {}
    for name, cfg in [
        ("pallas+svd", dict(matcher="pallas", solver="svd")),
        ("pallas+polar", dict(matcher="pallas", solver="polar")),
        ("xla+svd", dict(matcher="xla", solver="svd")),
    ]:
        try:
            ms = time_loop(cfg, scene)
            results[name] = ms
            print(f"[{name}] {ms:.3f} ms/iter", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAILED: {e}", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
