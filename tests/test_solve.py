"""Kabsch / point-to-plane solver unit tests vs numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from fpcr_tpu.core.transforms import gt_transform
from fpcr_tpu.ops.solve import (
    cross_covariance,
    kabsch_transform,
    masked_centroid,
    plane_normal_equations,
    plane_solve_update,
    point_to_plane_transform,
    rotation_from_svd,
    rotation_polar_newton_schulz,
)


@pytest.fixture
def cloud():
    rng = np.random.default_rng(7)
    return rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)


def test_masked_centroid(cloud):
    mask = np.zeros(cloud.shape[0], bool)
    mask[:123] = True
    got = np.asarray(masked_centroid(jnp.asarray(cloud), jnp.asarray(mask)))
    np.testing.assert_allclose(got, cloud[:123].mean(0), atol=1e-5)
    # no mask = plain mean
    got2 = np.asarray(masked_centroid(jnp.asarray(cloud)))
    np.testing.assert_allclose(got2, cloud.mean(0), atol=1e-5)


def test_cross_covariance_matches_numpy(cloud):
    gt = gt_transform((0.8, -0.3, 0.2), (0.2, -0.2, 0.05))
    q = np.asarray(gt.apply(jnp.asarray(cloud)))
    pb, qb = cloud.mean(0), q.mean(0)
    expected = (q - qb).T @ (cloud - pb)
    got = np.asarray(
        cross_covariance(jnp.asarray(cloud), jnp.asarray(q),
                         jnp.asarray(pb), jnp.asarray(qb))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("solver", ["svd", "polar"])
def test_kabsch_recovers_exact_transform(cloud, solver):
    gt = gt_transform((0.8, -0.3, 0.2), (0.2, -0.2, 0.05))
    q = gt.apply(jnp.asarray(cloud))
    est = kabsch_transform(jnp.asarray(cloud), q, solver=solver)
    np.testing.assert_allclose(
        np.asarray(est.rotation), np.asarray(gt.rotation), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(est.translation), np.asarray(gt.translation), atol=2e-5
    )


def test_kabsch_with_mask_ignores_outliers(cloud):
    gt = gt_transform((0.1, 0.05, -0.2), (0.1, -0.05, 0.2))
    q = np.asarray(gt.apply(jnp.asarray(cloud)))
    q_corrupt = q.copy()
    q_corrupt[:50] += 100.0  # gross outliers
    mask = np.ones(cloud.shape[0], bool)
    mask[:50] = False
    est = kabsch_transform(jnp.asarray(cloud), jnp.asarray(q_corrupt),
                           jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(est.rotation), np.asarray(gt.rotation), atol=1e-4)


def test_svd_det_correction_on_reflection():
    # A covariance whose uncorrected Kabsch answer is a reflection.
    W = jnp.asarray(np.diag([1.0, 1.0, -1.0]).astype(np.float32))
    R_uncorrected = np.asarray(rotation_from_svd(W, det_correction=False))
    R_corrected = np.asarray(rotation_from_svd(W, det_correction=True))
    assert np.linalg.det(R_uncorrected) == pytest.approx(-1.0, abs=1e-5)
    assert np.linalg.det(R_corrected) == pytest.approx(1.0, abs=1e-5)


def test_polar_matches_svd_rotation(cloud):
    gt = gt_transform((0.3, -0.1, 0.2), (0.4, 0.3, -0.2))
    q = gt.apply(jnp.asarray(cloud))
    pb = jnp.mean(jnp.asarray(cloud), axis=0)
    qb = jnp.mean(q, axis=0)
    W = cross_covariance(jnp.asarray(cloud), q, pb, qb)
    R_svd = np.asarray(rotation_from_svd(W, det_correction=False))
    R_pol = np.asarray(rotation_polar_newton_schulz(W))
    np.testing.assert_allclose(R_pol, R_svd, atol=1e-5)


def test_plane_normal_equations_vs_numpy(cloud):
    rng = np.random.default_rng(11)
    n = rng.normal(size=cloud.shape).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    q = cloud + 0.01 * rng.normal(size=cloud.shape).astype(np.float32)

    c = np.cross(cloud, n)
    J = np.concatenate([c, n], axis=1)
    r = ((cloud - q) * n).sum(1)
    C_ref = J.T @ J
    b_ref = -(J * r[:, None]).sum(0)

    C, b = plane_normal_equations(jnp.asarray(cloud), jnp.asarray(q), jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(C), C_ref, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-4, atol=1e-3)


def test_plane_solve_small_angle_recovery():
    """Point-to-plane solve on a plane-rich scene recovers a small motion."""
    rng = np.random.default_rng(13)
    # three orthogonal planes so the 6-DoF problem is well conditioned
    pts, nrm = [], []
    for axis in range(3):
        xy = rng.uniform(-1, 1, size=(200, 2)).astype(np.float32)
        p = np.zeros((200, 3), np.float32)
        cols = [c for c in range(3) if c != axis]
        p[:, cols] = xy
        p[:, axis] = float(axis)  # offset planes
        normal = np.zeros(3, np.float32)
        normal[axis] = 1.0
        pts.append(p)
        nrm.append(np.tile(normal, (200, 1)))
    q = np.concatenate(pts).astype(np.float32)
    n = np.concatenate(nrm).astype(np.float32)

    gt = gt_transform((0.004, -0.002, 0.003), (0.002, -0.004, 0.003))
    p_moved = np.asarray(gt.inverse().apply(jnp.asarray(q)))  # source displaced from target

    est = point_to_plane_transform(jnp.asarray(p_moved), jnp.asarray(q), jnp.asarray(n))
    # est should approximately undo gt.inverse(), i.e. match gt
    np.testing.assert_allclose(np.asarray(est.rotation), np.asarray(gt.rotation), atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.translation), np.asarray(gt.translation), atol=1e-4)


def test_plane_solve_update_damping_identity():
    C = jnp.eye(6) * 2.0
    b = jnp.zeros(6)
    tr, x = plane_solve_update(C, b, damping=0.1)
    np.testing.assert_allclose(np.asarray(x), np.zeros(6), atol=1e-7)
    np.testing.assert_allclose(np.asarray(tr.rotation), np.eye(3), atol=1e-7)


def test_degenerate_line_cloud_never_nans():
    """Rank-deficient geometry (1-D line cloud): the registration is
    mathematically underdetermined, but every solver/metric combination
    must return a FINITE orthogonal transform (identity update on solve
    failure), never NaN-poison the loop (fuzz-found round 2)."""
    import fpcr_tpu as f
    from fpcr_tpu.utils.diagnostics import validate_result

    rng = np.random.default_rng(42)
    ts = rng.uniform(-1, 1, 800)
    src = np.stack([ts, 2 * ts, -ts], 1) + rng.normal(scale=1e-4,
                                                      size=(800, 3))
    src = jnp.asarray(src.astype(np.float32))
    gt = f.gt_transform((0.02, -0.01, 0.01), (0.02, -0.01, 0.02))
    tgt = gt.apply(src)
    for metric in ("point", "plane", "symmetric", "gicp"):
        for solver in ("svd", "polar"):
            res = f.run_icp(src, tgt, f.ICPConfig(
                metric=metric, solver=solver, max_iterations=8))
            # raises RegistrationError on non-finite / reflection
            issues = validate_result(res, context=f"{metric}/{solver}")
            assert all("non-finite" not in i for i in issues), issues
