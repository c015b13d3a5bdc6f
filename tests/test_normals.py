"""kNN + PCA normal estimation vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from fpcr_tpu.ops.normals import estimate_normals, knn, normals_with_curvature


def np_knn(p, q, k):
    d = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


@pytest.fixture
def cloud():
    rng = np.random.default_rng(21)
    return rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)


@pytest.mark.parametrize("chunk,tile", [(1024, 2048), (64, 64), (128, 100)])
def test_knn_matches_numpy(cloud, chunk, tile):
    rng = np.random.default_rng(22)
    queries = rng.uniform(-1, 1, size=(111, 3)).astype(np.float32)
    idx, d = knn(jnp.asarray(queries), jnp.asarray(cloud), 5, chunk=chunk, tile=tile)
    ref_idx, ref_d = np_knn(queries, cloud, 5)
    np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_knn_self_query_first_neighbor_is_self(cloud):
    idx, d = knn(jnp.asarray(cloud), jnp.asarray(cloud), 5)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(cloud.shape[0]))
    assert float(np.asarray(d)[:, 0].max()) <= 1e-6


def test_knn_respects_mask(cloud):
    mask = np.ones(cloud.shape[0], bool)
    mask[150:] = False
    idx, d = knn(jnp.asarray(cloud), jnp.asarray(cloud), 4, jnp.asarray(mask))
    ref_idx, ref_d = np_knn(cloud, cloud[:150], 4)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_normals_on_plane():
    """Points on z = 3 plane → normals ±e_z everywhere."""
    rng = np.random.default_rng(23)
    pts = np.concatenate(
        [rng.uniform(-2, 2, size=(500, 2)), np.full((500, 1), 3.0)], axis=1
    ).astype(np.float32)
    n = np.asarray(estimate_normals(jnp.asarray(pts), k=4))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_normals_on_smooth_surface_match_analytic():
    """z = x² - y² has analytic normal ∝ (-2x, 2y, 1)."""
    from fpcr_tpu.data.synthetic import surface_grid

    pts = np.asarray(surface_grid(40))
    n = np.asarray(estimate_normals(jnp.asarray(pts), k=8))
    analytic = np.stack(
        [-2 * pts[:, 0], 2 * pts[:, 1], np.ones(len(pts))], axis=1
    )
    analytic /= np.linalg.norm(analytic, axis=1, keepdims=True)
    dots = np.abs((n * analytic).sum(1))
    # interior points should align well (boundary neighborhoods are skewed)
    interior = (np.abs(pts[:, 0]) < 1.5) & (np.abs(pts[:, 1]) < 1.5)
    assert np.quantile(dots[interior], 0.05) > 0.98


def test_normals_degenerate_collinear_points_finite():
    pts = np.stack([np.linspace(0, 1, 50)] * 3, axis=1).astype(np.float32)  # a line
    n = np.asarray(estimate_normals(jnp.asarray(pts), k=4))
    assert np.all(np.isfinite(n))
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)


def test_curvature_flat_vs_curved():
    rng = np.random.default_rng(24)
    flat = np.concatenate(
        [rng.uniform(-2, 2, size=(300, 2)), np.zeros((300, 1))], axis=1
    ).astype(np.float32)
    _, c_flat = normals_with_curvature(jnp.asarray(flat), k=8)
    assert float(np.asarray(c_flat).mean()) < 1e-3
