"""Example 2 — the reference's flagship pipeline: real Ouster OS1-16 hall
scan, point-to-plane ICP with on-device PCA normals
(GPU_point_to_plane_real.cu equivalent).

Run:  python examples/lidar_plane_icp.py [--cpu] [--quick]
(--quick strides the scan to ~2k points for fast smoke runs)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import fpcr_tpu as f

scene = f.hall_scene()  # parse packets -> polar->Cartesian -> GT pair
if "--quick" in sys.argv:
    scene = f.RegistrationScene(scene.source[::8], scene.target[::8],
                                scene.ground_truth)
print(f"hall scan: {scene.source.shape[0]} points")

result = f.icp_point_to_plane(
    scene.source, scene.target,
    config=f.ICPConfig(metric="plane", max_iterations=100, k_neighbors=4),
)

ni = int(result.num_iterations)
print(f"converged={bool(result.converged)} after {ni} iterations, "
      f"final error {float(np.asarray(result.errors)[ni-1]):.3e}")
print("transform RMSE vs GT:",
      float(f.transform_rmse(result.transform, scene.ground_truth, scene.source)))
