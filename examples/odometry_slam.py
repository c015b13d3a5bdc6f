"""Example 5 — odometry + loop closure: a small SLAM back-end.

A sensor sweeps a scene in T frames; ``register_sequence`` estimates the
open-loop trajectory (all T−1 pairwise ICPs in one vmapped program),
``detect_loop_closures`` finds and batch-verifies revisit pairs
automatically, each closure's uncertainty is estimated with the Censi GN
covariance, and ``close_loops`` redistributes the accumulated drift over
the whole trajectory with an SE(3) pose-graph Gauss-Newton solve using
full 6×6 information-weighted edges — all on device.

Also shows NDT (voxel Gaussian field) as the wide-basin alternative when
a frame's displacement is too large for plain ICP.

Run:  python examples/odometry_slam.py [--cpu] [--quick]
(--quick shrinks frames/trajectory for fast smoke runs)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import fpcr_tpu as f

rng = np.random.default_rng(0)
QUICK = "--quick" in sys.argv
world = np.asarray(f.synthetic_scene(width=64).source)  # 4,096 pts, x∈[-2,2]
T = 8 if QUICK else 12
N = 512 if QUICK else 1024

# ground-truth trajectory: the sensor sweeps +x and returns to the start
# (which is what makes a 0 ↔ T-1 loop closure possible)
xs = np.concatenate([np.linspace(0, 1.2, T // 2),
                     np.linspace(1.2, 0, T - T // 2)])
poses_gt = []
for t in range(T):
    M = np.eye(4, dtype=np.float32)
    M[0, 3] = xs[t]
    poses_gt.append(M)
poses_gt = np.stack(poses_gt)

# PARTIAL-OVERLAP frames: each frame sees only the N points nearest its
# viewpoint, with independent sensor noise. Consecutive pairs share ~80%
# of their points, so each pairwise ICP carries an independent pose error
# and the T-step composition random-walks into drift — while the direct
# 0 ↔ T-1 closure carries only ONE pairwise error. (With full-overlap
# frames the per-pair errors telescope away and there is nothing to fix.)
frames = []
for t in range(T):
    d = np.abs(world[:, 0] - xs[t])
    crop = world[np.argsort(d)[:N]]
    local = crop - poses_gt[t][:3, 3]  # pose is a pure translation here
    local = local + rng.normal(scale=4e-3, size=local.shape)
    frames.append(local.astype(np.float32))
frames = jnp.stack(frames)

# 1) open-loop odometry: T-1 pairwise ICPs in ONE vmapped program.
# auto_trim masks the non-overlapping tails out of the solve (frames
# share only ~80% of their points).
odo = f.register_sequence(frames, f.ICPConfig(max_iterations=25,
                                              auto_trim=9.0))
drift = float(np.abs(np.asarray(odo.poses[T - 1]) - poses_gt[T - 1]).max())
print(f"open-loop odometry end-pose drift: {drift:.2e}")

# 2) AUTOMATIC loop-closure detection: pose-proximity candidates,
# all verified at once with one vmapped registration
ei, ej, Z_all, w_all = f.detect_loop_closures(
    frames, odo, radius=0.3, min_separation=4, max_error=1e-2)
print(f"detected {int(ei.shape[0])} verified loop closure(s): "
      f"{list(zip(np.asarray(ei).tolist(), np.asarray(ej).tolist()))}")
if ei.shape[0] == 0:
    print("no verified closures — keeping the open-loop trajectory")
    sys.exit(0)

# 3) estimate every closure's uncertainty (Censi GN covariance → 6×6
# information, adjoint-transported to the edge tangent) — full
# information-weighted edges, not scalars
infos = []
for k in range(int(ei.shape[0])):
    tf_k = f.RigidTransform(Z_all[k, :3, :3], Z_all[k, :3, 3])
    cov = f.registration_covariance(frames[int(ej[k])], frames[int(ei[k])],
                                    tf_k, f.ICPConfig(auto_trim=9.0))
    infos.append(f.information_from_covariance(cov, tf_k))
    if k == 0:
        print(f"first closure pose std: "
              f"rot {float(jnp.sqrt(jnp.trace(cov[:3,:3])/3)):.1e} rad, "
              f"trans {float(jnp.sqrt(jnp.trace(cov[3:,3:])/3)):.1e}")
infos = jnp.stack(infos)
lam = float(jnp.trace(infos[0]) / 6.0)

# 4) pose-graph optimization over ALL detected closures with 6×6
# information edges redistributes the drift
res = f.close_loops(odo, ei, ej, Z_all, infos,
                    odometry_weight=lam / 20.0, iterations=6)
err = float(np.abs(np.asarray(res.poses[T - 1]) - poses_gt[T - 1]).max())
print(f"after loop closure + pose-graph GN:  {err:.2e} "
      f"(edge residual RMS {float(res.residual_rms[-1]):.2e})")

# 5) NDT: the wide-basin option for a big inter-frame jump
cloud = jnp.asarray(world[:2048])
big = f.gt_transform((0.3, -0.25, 0.2), (0.25, -0.2, 0.15))
moved = big.apply(cloud)
ndt = f.register_ndt(cloud, moved, f.ICPConfig(max_iterations=40))
print(f"NDT init + ICP refine on a 0.25-rad jump: GT error "
      f"{float(f.transform_rmse(ndt.transform, big, cloud)):.2e}")

# 6) fuse the optimized trajectory into one downsampled map
pts, valid = f.build_map(frames, res.poses, voxel_size=0.02)
print(f"fused map: {int(valid.sum())} voxels from {T}x{N} scan points")
