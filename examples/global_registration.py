"""Example 4 — global registration: unknown initial pose.

Every reference driver starts ICP from a known-small displacement; this
example registers the Stanford Bunny from a pose that traps plain ICP in a
local minimum, using FPFH features + hypothesis-parallel RANSAC for the
coarse alignment, then ICP for the final 1e-7-grade pose.

Run:  python examples/global_registration.py [--cpu] [--quick]
(--quick subsamples the Bunny for fast smoke runs)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import fpcr_tpu as f
from fpcr_tpu.data.bunny import load_bunny

source = load_bunny(resampled=True)  # 8,171 points
if "--quick" in sys.argv:
    source = source[::4]
# a large unknown pose: 1.2 rad of rotation — far outside ICP's basin
gt = f.gt_transform(translation=(0.1, -0.05, 0.08),
                    rotation_rad=(0.4, 1.2, -0.8))
target = gt.apply(source)

plain = f.run_icp(source, target, f.ICPConfig(max_iterations=60))
print(f"plain ICP from identity: GT error "
      f"{float(f.transform_rmse(plain.transform, gt, source)):.2e} "
      f"(trapped in a local minimum)")

coarse = f.global_registration(source, target)
print(f"FPFH+RANSAC coarse: {int(coarse.num_inliers)} inliers / "
      f"{int(coarse.num_correspondences)} mutual correspondences, "
      f"GT error {float(f.transform_rmse(coarse.transform, gt, source)):.2e}")

refined = f.register_global(source, target,
                            config=f.ICPConfig(max_iterations=40))
print(f"global + ICP refine: GT error "
      f"{float(f.transform_rmse(refined.transform, gt, source)):.2e}")
