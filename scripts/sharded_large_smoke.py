"""Sharded large-N smoke on the virtual CPU mesh (single-chip-free check of
the 1M multi-chip configuration).

Two stages (VERDICT r1 item #2c):
 1. parity — the sharded morton loop matches the single-device loop on the
    same small cloud (transforms equal to reduction-order tolerance);
 2. scale — the full 1M-point production configuration (morton matcher,
    XLA band impl on CPU) runs sharded over 8 virtual devices for a few
    iterations and actually reduces the error / recovers a small GT motion.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/sharded_large_smoke.py [--n 1048576] [--iters 3]
(the script force-sets the CPU platform itself; the XLA flag is set
programmatically too if absent)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import fpcr_tpu as f  # noqa: E402
from fpcr_tpu.parallel.dist_icp import distributed_icp, make_mesh  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    mesh = make_mesh(8)
    print(f"mesh: {mesh.devices.size} x {mesh.devices.ravel()[0].platform}")

    # --- stage 1: sharded == single-device on a small morton run
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.uniform(-2, 2, (8192, 3)).astype(np.float32))
    gt = f.gt_transform((0.004, -0.003, 0.002), (0.002, -0.003, 0.002))
    tgt = gt.apply(src)
    cfg = f.ICPConfig(matcher="morton", morton_impl="xla", max_iterations=12)
    single = f.run_icp(src, tgt, cfg)
    dist = distributed_icp(src, tgt, cfg, mesh=mesh)
    dr = float(np.abs(np.asarray(single.transform.rotation)
                      - np.asarray(dist.transform.rotation)).max())
    dt = float(np.abs(np.asarray(single.transform.translation)
                      - np.asarray(dist.transform.translation)).max())
    print(f"stage1 parity: max|dR|={dr:.2e} max|dt|={dt:.2e} "
          f"(single {int(single.num_iterations)} iters, "
          f"sharded {int(dist.num_iterations)})")
    assert dr < 1e-5 and dt < 1e-5, (dr, dt)
    assert float(f.transform_rmse(dist.transform, gt, src)) < 1e-4

    # --- stage 2: the 1M production configuration, sharded
    n = args.n
    rng = np.random.default_rng(7)
    big = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32))
    gt_big = f.gt_transform((0.02, -0.015, 0.01), (0.004, -0.006, 0.004))
    tgt_big = gt_big.apply(big)
    cfg_big = f.ICPConfig(matcher="morton", morton_impl="xla",
                          max_iterations=args.iters, tolerance=0.0)
    t0 = time.perf_counter()
    res = distributed_icp(big, tgt_big, cfg_big, mesh=mesh)
    jax.block_until_ready(res.errors)
    wall = time.perf_counter() - t0
    errs = np.asarray(res.errors)[: int(res.num_iterations)]
    frac = np.asarray(res.matched_fraction)[: int(res.num_iterations)]
    gt_err = float(f.transform_rmse(res.transform, gt_big, big))
    print(f"stage2 {n:,} pts sharded x8: wall {wall:.1f}s "
          f"errors {errs} matched_fraction {frac} GT err {gt_err:.2e}")
    assert np.isfinite(errs).all()
    assert len(errs) < 2 or errs[-1] < errs[0], errs  # the loop is actually converging
    # morton's default auto_trim (9x iteratively-trimmed mean) keeps ~45%
    # of a UNIFORM random cloud — the gate is intentionally conservative;
    # structured scan geometry keeps far more (see hall/bunny tests)
    assert (frac > 0.25).all(), frac
    print("sharded large smoke PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
