"""Unit tests for rigid transforms and rotation conventions (vs numpy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fpcr_tpu.core.transforms import (
    RigidTransform,
    gt_transform,
    rotation_gt,
    rotation_x,
    rotation_y,
    rotation_z,
    rotation_zyx,
)


def _np_rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _np_rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _np_rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


@pytest.mark.parametrize("angles", [(0.2, -0.2, 0.05), (0.0, 0.0, 0.0), (1.1, 0.7, -2.0)])
def test_rotation_zyx_matches_composition(angles):
    rx, ry, rz = angles
    expected = _np_rot_z(rz) @ _np_rot_y(ry) @ _np_rot_x(rx)
    got = np.asarray(rotation_zyx(rx, ry, rz))
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.parametrize("angles", [(0.2, -0.2, 0.05), (0.15, -0.1, 0.05), (0.01, -0.003, 0.05)])
def test_rotation_gt_is_a_rotation(angles):
    R = np.asarray(rotation_gt(*angles), dtype=np.float64)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


def test_axis_rotations():
    for fn, ref in [(rotation_x, _np_rot_x), (rotation_y, _np_rot_y), (rotation_z, _np_rot_z)]:
        np.testing.assert_allclose(np.asarray(fn(0.37)), ref(0.37), atol=1e-6)


def test_apply_compose_inverse_roundtrip():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(100, 3)), dtype=jnp.float32)
    a = gt_transform((0.8, -0.3, 0.2), (0.2, -0.2, 0.05))
    b = gt_transform((0.1, 0.2, -0.3), (-0.05, 0.1, 0.02))

    # compose semantics: (a∘b)(x) == a(b(x))
    np.testing.assert_allclose(
        np.asarray(a.compose(b).apply(pts)),
        np.asarray(a.apply(b.apply(pts))),
        atol=1e-5,
    )
    # inverse round-trips
    np.testing.assert_allclose(
        np.asarray(a.inverse().apply(a.apply(pts))), np.asarray(pts), atol=1e-5
    )
    # identity is neutral
    np.testing.assert_allclose(
        np.asarray(RigidTransform.identity().apply(pts)), np.asarray(pts), atol=0
    )


def test_as_matrix_homogeneous():
    a = gt_transform((0.8, -0.3, 0.2), (0.2, -0.2, 0.05))
    M = np.asarray(a.as_matrix())
    pts = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
    hom = np.concatenate([pts, np.ones((10, 1), np.float32)], axis=1)
    np.testing.assert_allclose((M @ hom.T).T[:, :3], np.asarray(a.apply(pts)), atol=1e-5)


def test_gt_transform_matches_reference_pipeline():
    """M = R·D + t with the reference's exact h_r formula
    (/root/reference/src/ICP_point_to_point.cu:158-190)."""
    rng = np.random.default_rng(2)
    D = rng.normal(size=(50, 3)).astype(np.float32)
    t = np.array([0.8, -0.3, 0.2], np.float32)
    rx, ry, rz = 0.2, -0.2, 0.05
    cx, cy, cz = np.cos([rx, ry, rz])
    sx, sy, sz = np.sin([rx, ry, rz])
    # reference h_r is column-major; build the row-major matrix explicitly
    R = np.array(
        [
            [cy * cz, -cy * sz, sy],
            [cz * sx * sy + cx * sz, cx * cz - sx * sy * sz, -cy * sx],
            [-cx * cz * sy + sx * sz, cx * sy * sz + cz * sx, cx * cy],
        ]
    )
    expected = D @ R.T + t
    got = np.asarray(gt_transform(t, (rx, ry, rz)).apply(jnp.asarray(D)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rotation_exp_log_roundtrip():
    from fpcr_tpu.core.transforms import rotation_exp, rotation_log

    for w in ([0.2, -0.1, 0.3], [1e-8, 0, 0], [0.0, 0.0, 0.0], [1.2, 0.5, -0.8]):
        w = np.asarray(w, np.float32)
        R = np.asarray(rotation_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        w_back = np.asarray(rotation_log(jnp.asarray(R)))
        np.testing.assert_allclose(w_back, w, atol=1e-5)


def test_transform_vector_roundtrip():
    from fpcr_tpu.core.transforms import transform_to_vector, vector_to_transform

    t = gt_transform((0.8, -0.3, 0.2), (0.2, -0.2, 0.05))
    x = transform_to_vector(t)
    t2 = vector_to_transform(x)
    np.testing.assert_allclose(np.asarray(t2.rotation), np.asarray(t.rotation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2.translation), np.asarray(t.translation), atol=1e-6)
