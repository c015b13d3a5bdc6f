"""Pose-graph optimization: SE(3) helpers, GN convergence, odometry fusion."""

import numpy as np
import jax.numpy as jnp
import pytest

import fpcr_tpu as f
from fpcr_tpu.models.pose_graph import (
    close_loops,
    optimize_pose_graph,
    se3_adjoint,
    se3_exp,
    se3_inv,
    se3_log,
)


def _rand_xi(rng, rho=0.3, w=0.15):
    return jnp.asarray(np.concatenate([
        rng.normal(scale=rho, size=3),
        rng.normal(scale=w, size=3)]).astype(np.float32))


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        xi = _rand_xi(rng)
        np.testing.assert_allclose(np.asarray(se3_log(se3_exp(xi))),
                                   np.asarray(xi), atol=1e-6)


def test_se3_inv_and_adjoint():
    rng = np.random.default_rng(1)
    M = se3_exp(_rand_xi(rng))
    np.testing.assert_allclose(np.asarray(M @ se3_inv(M)), np.eye(4),
                               atol=1e-6)
    d = _rand_xi(rng, 0.1, 0.05)
    lhs = M @ se3_exp(d) @ se3_inv(M)
    rhs = se3_exp(se3_adjoint(M) @ d)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def _make_chain(rng, T, noise=0.01):
    """(gt_poses, noisy_odometry_measurements, noisy_initial_poses)."""
    gt = [jnp.eye(4)]
    steps = []
    for _ in range(T - 1):
        steps.append(se3_exp(_rand_xi(rng)))
        gt.append(gt[-1] @ steps[-1])
    noisy, poses0 = [], [jnp.eye(4)]
    for t in range(T - 1):
        z = steps[t] @ se3_exp(_rand_xi(rng, noise, noise / 2))
        noisy.append(z)
        poses0.append(poses0[-1] @ z)
    return jnp.stack(gt), jnp.stack(noisy), jnp.stack(poses0)


def test_consistent_graph_exact_recovery():
    """Noise-free measurements: GN must keep (and sharpen) the exact graph."""
    rng = np.random.default_rng(2)
    gt, _, _ = _make_chain(rng, 10, noise=0.0)
    ei = jnp.arange(9, dtype=jnp.int32)
    ej = jnp.arange(1, 10, dtype=jnp.int32)
    meas = jnp.stack([se3_inv(gt[i]) @ gt[i + 1] for i in range(9)])
    res = optimize_pose_graph(gt, ei, ej, meas, iterations=3)
    np.testing.assert_allclose(np.asarray(res.poses), np.asarray(gt),
                               atol=1e-5)
    assert float(res.residual_rms[-1]) < 1e-6


def test_loop_closure_kills_drift():
    rng = np.random.default_rng(3)
    T = 30
    gt, noisy, poses0 = _make_chain(rng, T)
    drift0 = float(jnp.abs(poses0[-1] - gt[-1]).max())
    ei = jnp.concatenate([jnp.arange(T - 1, dtype=jnp.int32),
                          jnp.asarray([0], jnp.int32)])
    ej = jnp.concatenate([jnp.arange(1, T, dtype=jnp.int32),
                          jnp.asarray([T - 1], jnp.int32)])
    meas = jnp.concatenate(
        [noisy, (se3_inv(gt[0]) @ gt[T - 1])[None]])
    w = jnp.concatenate([jnp.ones(T - 1), jnp.asarray([50.0])])
    res = optimize_pose_graph(poses0, ei, ej, meas, w, iterations=8)
    drift1 = float(jnp.abs(res.poses[-1] - gt[-1]).max())
    assert drift1 < drift0 * 0.05, (drift0, drift1)
    # monotone-ish improvement visible in the rms history
    rms = np.asarray(res.residual_rms)
    assert rms[-1] < rms[0]


def test_close_loops_with_real_odometry():
    """End-to-end: scan sequence → register_sequence → one loop closure
    (last frame re-registered onto frame 0) → drift drops."""
    rng = np.random.default_rng(4)
    base = f.synthetic_scene(width=24).source  # 576 pts
    T = 6
    # ground-truth trajectory: small per-step motion
    gts = [f.gt_transform((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))]
    for t in range(1, T):
        gts.append(f.gt_transform(
            tuple(0.01 * rng.standard_normal(3)),
            tuple(0.02 * rng.standard_normal(3))))
    # frames: frame t sees the cloud moved by the INVERSE cumulative pose
    frames = []
    cum = jnp.eye(4)
    poses_gt = []
    for t in range(T):
        step = jnp.asarray(np.block([
            [np.asarray(gts[t].rotation), np.asarray(gts[t].translation)[:, None]],
            [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))
        cum = cum @ step
        poses_gt.append(cum)
        R = cum[:3, :3]
        tt = cum[:3, 3]
        # pose maps frame t -> frame 0: frame-t cloud = pose^{-1} applied
        frames.append((base - tt) @ R)
    frames = jnp.stack(frames)
    poses_gt = jnp.stack(poses_gt)

    odo = f.register_sequence(frames, f.ICPConfig(max_iterations=25))
    # loop closure: register the last frame directly onto frame 0
    lc = f.run_icp(frames[T - 1], frames[0], f.ICPConfig(max_iterations=40))
    lcm = jnp.asarray(np.block([
        [np.asarray(lc.transform.rotation),
         np.asarray(lc.transform.translation)[:, None]],
        [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))

    res = close_loops(odo, jnp.asarray([0], jnp.int32),
                      jnp.asarray([T - 1], jnp.int32), lcm[None],
                      jnp.asarray([20.0]), iterations=6)
    err_before = float(jnp.abs(odo.poses[T - 1] - poses_gt[T - 1]).max())
    err_after = float(jnp.abs(res.poses[T - 1] - poses_gt[T - 1]).max())
    # the closure edge is a direct (drift-free) measurement — the optimized
    # end pose must be at least as good and the graph consistent
    assert err_after <= err_before + 1e-6, (err_before, err_after)
    assert float(res.residual_rms[-1]) < 1e-2


def test_se3_log_near_pi():
    """Loop-closure geometry: ~180° relative rotations must roundtrip
    (the naive skew-part log diverges there — review finding r2)."""
    from fpcr_tpu.models.pose_graph import _so3_log
    from fpcr_tpu.core.transforms import rotation_exp

    rng = np.random.default_rng(9)
    for th in (3.0, 3.14, np.pi - 1e-4, np.pi):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        w = jnp.asarray((th * axis).astype(np.float32))
        R = rotation_exp(w)
        w2 = _so3_log(R)
        R2 = rotation_exp(w2)
        # log may return the equivalent -w at exactly pi; compare matrices.
        # tolerance: f32 arccos loses ~sqrt(eps) angle precision near pi
        # (1e-4-grade) — the failure mode being regressed here was 8.6
        # absolute garbage from the skew-only formula
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=5e-4)
