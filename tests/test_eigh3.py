"""Closed-form 3x3 eigensolver vs numpy.linalg.eigh."""

import numpy as np
import jax.numpy as jnp
import pytest

from fpcr_tpu.ops.eigh3 import eigh3, eigvals3, smallest_eigenvector


def random_symmetric(batch, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(batch, 3, 3)).astype(np.float32) * scale
    return (X + X.transpose(0, 2, 1)) / 2


def test_eigvals_match_numpy():
    A = random_symmetric(200, seed=1)
    got = np.asarray(eigvals3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_smallest_eigenvector_matches_numpy():
    A = random_symmetric(200, seed=2)
    v, lam = smallest_eigenvector(jnp.asarray(A))
    v = np.asarray(v)
    w_ref, v_ref = np.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(lam), w_ref[:, 0], atol=1e-4)
    # sign-invariant comparison
    dots = np.abs(np.sum(v * v_ref[:, :, 0], axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
    # unit norm
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_eigh3_full_decomposition():
    A = random_symmetric(100, seed=3)
    lams, vecs = eigh3(jnp.asarray(A))
    lams, vecs = np.asarray(lams), np.asarray(vecs)
    # A v = lam v for each column
    for kk in range(3):
        resid = np.einsum("bij,bj->bi", A, vecs[:, :, kk]) - lams[:, kk, None] * vecs[:, :, kk]
        assert np.abs(resid).max() < 2e-3
    # orthonormal frames
    gram = np.einsum("bik,bil->bkl", vecs, vecs)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=1e-4)


def test_isotropic_fallback():
    A = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
    v, lam = smallest_eigenvector(A)
    np.testing.assert_allclose(np.asarray(lam), 2.5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v), np.broadcast_to(np.ones(3) / np.sqrt(3), (4, 3)), atol=1e-6
    )


def test_planar_covariance_gives_plane_normal():
    """Points on the plane z=0 → smallest eigenvector = ±e_z."""
    rng = np.random.default_rng(4)
    pts = np.zeros((50, 3), np.float32)
    pts[:, :2] = rng.normal(size=(50, 2))
    cov = (pts - pts.mean(0)).T @ (pts - pts.mean(0))
    v, lam = smallest_eigenvector(jnp.asarray(cov))
    assert abs(abs(float(np.asarray(v)[2])) - 1.0) < 1e-4
    assert float(lam) < 1e-3


def test_near_degenerate_pair_stable():
    """Two nearly equal small eigenvalues (collinear-ish cloud) stays finite."""
    D = np.diag([1e-6, 1.1e-6, 5.0]).astype(np.float32)
    rng = np.random.default_rng(5)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    A = (Q @ D @ Q.T).astype(np.float32)
    v, lam = smallest_eigenvector(jnp.asarray(A))
    assert np.all(np.isfinite(np.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v)), 1.0, atol=1e-4)


def test_eigh3_isotropic_matrix_orthonormal_frame():
    """A = λI (isotropic voxel, e.g. duplicate/symmetric points): every
    eigenvector fallback fires, and the returned frame must STILL be
    orthonormal — V diag(1/λ) Vᵀ must reconstruct I/λ (review find r3:
    a fixed-axis v_mid fallback gave a non-orthonormal frame and an
    O(1)-wrong inverse covariance)."""
    from fpcr_tpu.ops.eigh3 import eigh3

    for lam in (1.0, 0.25):
        A = jnp.asarray(lam * np.eye(3, dtype=np.float32))[None]
        lams, vecs = eigh3(A)
        V = np.asarray(vecs)[0]
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lams)[0], [lam] * 3, atol=1e-6)
        sinv = V @ np.diag(1.0 / np.asarray(lams)[0]) @ V.T
        np.testing.assert_allclose(sinv, np.eye(3) / lam, atol=1e-5)


def test_eigh3_near_isotropic_batch():
    """Randomly rotated near-repeated spectra stay orthonormal."""
    from fpcr_tpu.ops.eigh3 import eigh3

    rng = np.random.default_rng(5)
    mats = []
    for _ in range(64):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        lam = 1.0 + rng.uniform(-1e-6, 1e-6, 3)
        mats.append((q * lam) @ q.T)
    A = jnp.asarray(np.stack(mats).astype(np.float32))
    _, vecs = eigh3(A)
    V = np.asarray(vecs)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), V.shape)
    np.testing.assert_allclose(np.einsum("bij,bik->bjk", V, V), eye,
                               atol=1e-4)
