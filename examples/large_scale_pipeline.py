"""Example 3 — beyond the reference: million-point registration with the
coarse-to-fine pipeline (brute subset ICP -> Morton-banded full-res ICP),
plus the multi-chip variant when more than one device is visible.

Run:  python examples/large_scale_pipeline.py [--cpu] [--width 512] [--quick]
(--quick = --width 64, for fast smoke runs)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import fpcr_tpu as f
from fpcr_tpu.models.pipeline import icp_coarse_to_fine

width = 512  # 262,144 points; use 1024 for 1M+
if "--quick" in sys.argv:
    width = 64
if "--width" in sys.argv:
    width = int(sys.argv[sys.argv.index("--width") + 1])

scene = f.synthetic_scene(width=width)
print(f"{scene.source.shape[0]:,} points on {jax.devices()[0].platform}")

res = icp_coarse_to_fine(
    scene.source, scene.target,
    coarse_config=f.ICPConfig(max_iterations=40),
    fine_config=f.ICPConfig(matcher="morton", max_iterations=20),
    coarse_points=4096,
)
print("coarse iters:", int(res.coarse.num_iterations),
      "fine iters:", int(res.fine.num_iterations))
print("transform RMSE vs GT:",
      float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)))

if len(jax.devices()) > 1:
    from fpcr_tpu.parallel.dist_icp import distributed_icp

    dist = distributed_icp(scene.source, scene.target,
                           f.ICPConfig(max_iterations=40))
    print(f"distributed over {len(jax.devices())} devices:",
          float(f.transform_rmse(dist.transform, scene.ground_truth, scene.source)))
