"""Example 1 — basic point-to-point registration (the reference's
ICP_point_to_point workload: synthetic z=x²-y² grid, GT transform recovery).

Run:  python examples/basic_registration.py [--cpu] [--quick]
(--quick shrinks the scene for fast smoke runs, e.g. in CI)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import fpcr_tpu as f

# the reference's canonical scene: 128x128 grid, t=(0.8,-0.3,0.2),
# r=(0.2,-0.2,0.05) rad
scene = f.synthetic_scene(width=24 if "--quick" in sys.argv else 128)

result = f.icp_point_to_point(
    scene.source, scene.target,
    config=f.ICPConfig(max_iterations=40, tolerance=1e-6),
)

ni = int(result.num_iterations)
print(f"converged={bool(result.converged)} after {ni} iterations")
print("error sequence:", np.round(np.asarray(result.errors)[:ni], 8))
print("recovered rotation:\n", np.asarray(result.transform.rotation))
print("recovered translation:", np.asarray(result.transform.translation))
print("ground truth translation:", np.asarray(scene.ground_truth.translation))
print("transform RMSE vs GT:",
      float(f.transform_rmse(result.transform, scene.ground_truth, scene.source)))

# ground-truth-free quality check (what you'd use on real scan pairs)
ev = f.evaluate_registration(scene.source, scene.target, result.transform,
                             max_correspondence_dist=0.05)
print(f"evaluation: fitness={float(ev['fitness']):.4f} "
      f"inlier_rmse={float(ev['inlier_rmse']):.2e}")
