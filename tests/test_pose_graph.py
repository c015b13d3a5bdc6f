"""Pose-graph optimization: SE(3) helpers, GN convergence, odometry fusion."""

import numpy as np
import jax.numpy as jnp

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


def test_detect_loop_closures_end_to_end():
    """Sliding-window frames that return to the start: detection finds a
    0 <-> T-1 closure, verification keeps it, and the optimized graph
    beats open-loop odometry."""
    from fpcr_tpu.models.pose_graph import detect_loop_closures

    rng = np.random.default_rng(11)
    world = np.asarray(f.synthetic_scene(width=48).source)
    T, N = 8, 512
    xs = np.concatenate([np.linspace(0, 0.8, T // 2),
                         np.linspace(0.8, 0.0, T - T // 2)])
    frames, poses_gt = [], []
    for t in range(T):
        M = np.eye(4, dtype=np.float32)
        M[0, 3] = xs[t]
        poses_gt.append(M)
        d = np.abs(world[:, 0] - xs[t])
        crop = world[np.argsort(d)[:N]]
        local = crop - M[:3, 3]
        frames.append((local + rng.normal(scale=3e-3, size=local.shape))
                      .astype(np.float32))
    frames = jnp.stack([jnp.asarray(fr) for fr in frames])

    odo = f.register_sequence(frames, f.ICPConfig(max_iterations=25,
                                                  auto_trim=9.0))
    ei, ej, Z, w = detect_loop_closures(
        frames, odo, radius=0.3, min_separation=3, max_error=1e-2)
    assert ei.shape[0] >= 1
    # the SPECIFIC long-range return-to-start closure must be found, and
    # the largest-separation-first ordering must surface it first
    assert (int(ei[0]), int(ej[0])) == (0, T - 1), (ei, ej)
    res = f.close_loops(odo, ei, ej, Z, w, iterations=6)
    err_open = float(jnp.abs(odo.poses[T - 1]
                             - jnp.asarray(poses_gt[T - 1])).max())
    err_opt = float(jnp.abs(res.poses[T - 1]
                            - jnp.asarray(poses_gt[T - 1])).max())
    assert err_opt < err_open, (err_open, err_opt)


def test_detect_loop_closures_none_found():
    from fpcr_tpu.models.pose_graph import detect_loop_closures

    rng = np.random.default_rng(12)
    base = jnp.asarray(rng.uniform(-1, 1, (3, 256, 3)).astype(np.float32))
    odo = f.register_sequence(base, f.ICPConfig(max_iterations=5))
    ei, ej, Z, w = detect_loop_closures(base, odo, radius=1e-12,
                                        min_separation=2)
    assert ei.shape[0] == 0 and Z.shape == (0, 4, 4)


def test_nan_measurement_does_not_poison_trajectory():
    """Never-NaN solver contract (advisor finding r2): a NaN edge
    measurement must hold the trajectory (identity update), not NaN every
    pose through the global Cholesky."""
    rng = np.random.default_rng(13)
    gt, meas, poses0 = _make_chain(rng, 8, noise=0.01)
    ei = jnp.arange(7, dtype=jnp.int32)
    ej = jnp.arange(1, 8, dtype=jnp.int32)
    meas = meas.at[3].set(jnp.full((4, 4), jnp.nan))
    res = optimize_pose_graph(poses0, ei, ej, meas, iterations=4)
    assert bool(jnp.isfinite(res.poses).all())
    np.testing.assert_allclose(np.asarray(res.poses),
                               np.asarray(poses0), atol=1e-6)
