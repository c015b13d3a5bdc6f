"""Matching (brute-force NN) vs a numpy oracle, incl. masks and tiling."""

import jax.numpy as jnp
import numpy as np
import pytest

from fpcr_tpu.ops.matching import (
    gather_correspondences,
    nn_argmin,
    pairwise_sqdist,
    pairwise_sqdist_exact,
)

from helpers import np_nn


@pytest.fixture
def clouds():
    rng = np.random.default_rng(42)
    p = rng.uniform(-2, 2, size=(257, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, size=(389, 3)).astype(np.float32)
    return p, q


def test_pairwise_sqdist_forms_agree(clouds):
    p, q = clouds
    a = np.asarray(pairwise_sqdist(jnp.asarray(p), jnp.asarray(q)))
    b = np.asarray(pairwise_sqdist_exact(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("chunk,tile", [(64, 64), (128, 100), (2048, 2048)])
def test_nn_argmin_matches_numpy(clouds, chunk, tile):
    p, q = clouds
    idx, dmin = nn_argmin(
        jnp.asarray(p), jnp.asarray(q), source_chunk=chunk, target_tile=tile
    )
    ref_idx, ref_d = np_nn(p, q)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(dmin), ref_d, atol=1e-4)


def test_nn_argmin_exact_mode(clouds):
    p, q = clouds
    idx, _ = nn_argmin(jnp.asarray(p), jnp.asarray(q), exact=True,
                       source_chunk=64, target_tile=64)
    ref_idx, _ = np_nn(p, q)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_nn_argmin_respects_target_mask(clouds):
    p, q = clouds
    mask = np.ones(q.shape[0], bool)
    mask[100:] = False  # only first 100 targets valid
    idx, dmin = nn_argmin(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(mask),
        source_chunk=64, target_tile=64,
    )
    ref_idx, ref_d = np_nn(p, q[:100])
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(dmin), ref_d, atol=1e-4)


def test_nn_argmin_first_min_tie_break():
    """Reference keeps the first strict minimum
    (/root/reference/src/CUDA/ICP_point_to_point_clean.cu:53-57)."""
    p = jnp.asarray([[0.0, 0.0, 0.0]], dtype=jnp.float32)
    # duplicate nearest point at indices 1 and 3 — must pick 1
    q = jnp.asarray(
        [[5, 0, 0], [1, 0, 0], [2, 0, 0], [1, 0, 0]], dtype=jnp.float32
    )
    idx, _ = nn_argmin(p, q, source_chunk=8, target_tile=8)
    assert int(idx[0]) == 1
    # ...also when the duplicates span different tiles
    idx2, _ = nn_argmin(p, q, source_chunk=8, target_tile=2)
    assert int(idx2[0]) == 1


def test_gather_correspondences(clouds):
    p, q = clouds
    idx, _ = nn_argmin(jnp.asarray(p), jnp.asarray(q))
    gathered = np.asarray(gather_correspondences(jnp.asarray(q), idx))
    np.testing.assert_array_equal(gathered, q[np.asarray(idx)])


def test_nn_argmin_identity_self_match():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    idx, dmin = nn_argmin(jnp.asarray(pts), jnp.asarray(pts),
                          source_chunk=128, target_tile=128)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(300))
    assert float(np.max(np.asarray(dmin))) <= 1e-5
