"""Pallas matching kernel vs the XLA path and numpy (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fpcr_tpu.ops.matching import nn_argmin
from fpcr_tpu.ops.matching_pallas import nn_argmin_pallas

from helpers import np_nn


@pytest.fixture
def clouds():
    rng = np.random.default_rng(77)
    p = rng.uniform(-2, 2, size=(300, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
    return p, q


def test_pallas_matches_numpy(clouds):
    p, q = clouds
    idx, d = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                              block_n=64, block_m=128)
    ref_idx, ref_d = np_nn(p, q)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-3)


def test_pallas_matches_xla_path(clouds):
    p, q = clouds
    idx_p, _ = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                                block_n=64, block_m=128)
    idx_x, _ = nn_argmin(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_pallas_target_mask(clouds):
    p, q = clouds
    mask = np.ones(q.shape[0], bool)
    mask[200:] = False
    idx, d = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q), jnp.asarray(mask),
                              block_n=64, block_m=128)
    ref_idx, ref_d = np_nn(p, q[:200])
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-3)


def test_pallas_tie_break_first_min():
    p = jnp.asarray([[0.0, 0.0, 0.0]], dtype=jnp.float32)
    q = jnp.asarray([[5, 0, 0], [1, 0, 0], [2, 0, 0], [1, 0, 0]], dtype=jnp.float32)
    idx, _ = nn_argmin_pallas(p, q, block_n=8, block_m=128)
    assert int(idx[0]) == 1


def test_pallas_odd_sizes():
    """Non-multiple-of-block sizes pad correctly."""
    rng = np.random.default_rng(78)
    p = rng.uniform(-1, 1, size=(131, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, size=(259, 3)).astype(np.float32)
    idx, d = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                              block_n=64, block_m=128)
    ref_idx, _ = np_nn(p, q)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_pallas_in_icp_loop():
    """matcher='pallas' end-to-end via the config switch."""
    import fpcr_tpu as f

    scene = f.synthetic_scene(width=16)
    res = f.icp_point_to_point(
        scene.source, scene.target,
        config=f.ICPConfig(max_iterations=60, matcher="pallas"),
    )
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_packed6_vs_highest_modes(clouds):
    """The K-packed bf16x6 default must agree with the bit-exact HIGHEST
    kernel: identical argmins away from ties, f32-grade distances."""
    p, q = clouds
    i6, d6 = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                              block_n=64, block_m=128, mode="packed6")
    ih, dh = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                              block_n=64, block_m=128, mode="highest")
    np.testing.assert_array_equal(np.asarray(i6), np.asarray(ih))
    np.testing.assert_allclose(np.asarray(d6), np.asarray(dh), atol=1e-5)


def test_packed6_rejects_unknown_mode(clouds):
    p, q = clouds
    with pytest.raises(ValueError):
        nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q), mode="fast")


def test_pallas_all_masked_target_returns_inf(clouds):
    """No valid target => dmin inf, same unmatched convention as nn_argmin
    (review find r3: the kernel's 1e30 invalid surrogate used to leak out
    as a finite distance)."""
    p, q = clouds
    mask = np.zeros(q.shape[0], bool)
    _, d = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                            jnp.asarray(mask))
    assert np.isinf(np.asarray(d)).all()
    # and the XLA reference path agrees
    from fpcr_tpu.ops.matching import nn_argmin

    _, d_ref = nn_argmin(jnp.asarray(p), jnp.asarray(q), jnp.asarray(mask))
    assert np.isinf(np.asarray(d_ref)).all()

def test_packed6_idx_matches_exact(clouds):
    """The round-5 packed (value|index) reduction: identical picks away
    from ties; swaps only within the quantization bound (2^-(23-idx_bits)
    relative sqdist); distances recomputed exactly for the selected
    target."""
    p, q = clouds
    jp, jq = jnp.asarray(p), jnp.asarray(q)
    i_ref, d_ref = nn_argmin_pallas(jp, jq, block_n=64, block_m=128,
                                    mode="highest")
    i_pk, d_pk = nn_argmin_pallas(jp, jq, block_n=64, block_m=128,
                                  mode="packed6_idx")
    i_ref, d_ref = np.asarray(i_ref), np.asarray(d_ref)
    i_pk, d_pk = np.asarray(i_pk), np.asarray(d_pk)
    diff = i_pk != i_ref
    # quantization-class swaps only: selected distance within the dropped-
    # mantissa bound of the true minimum (idx_bits=9 for m_pad=512)
    assert diff.mean() < 0.02
    if diff.any():
        rel = (d_pk[diff] - d_ref[diff]) / np.maximum(d_ref[diff], 1e-12)
        assert rel.max() < 2.0 ** -(23 - 9) * 4
    # returned distance is the EXACT distance to the selected target
    d_sel = ((p - q[i_pk]) ** 2).sum(1)
    np.testing.assert_allclose(d_pk, d_sel, rtol=1e-6, atol=1e-7)


def test_packed6_idx_masked_and_all_masked(clouds):
    p, q = clouds
    mask = np.ones(q.shape[0], bool)
    mask[200:] = False
    idx, d = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                              jnp.asarray(mask), block_n=64, block_m=128,
                              mode="packed6_idx")
    assert int(np.asarray(idx).max()) < 200
    none = np.zeros(q.shape[0], bool)
    _, d0 = nn_argmin_pallas(jnp.asarray(p), jnp.asarray(q),
                             jnp.asarray(none), block_n=64, block_m=128,
                             mode="packed6_idx")
    assert np.isinf(np.asarray(d0)).all()


def test_packed6_idx_scale_gate():
    p = jnp.zeros((8, 3), jnp.float32)
    q = jnp.zeros((70000, 3), jnp.float32)
    with pytest.raises(ValueError, match="packed6_idx"):
        nn_argmin_pallas(p, q, mode="packed6_idx")


def test_packed6_idx_in_icp_loop():
    import fpcr_tpu as f

    scene = f.synthetic_scene(width=16)
    res = f.icp_point_to_point(
        scene.source, scene.target,
        config=f.ICPConfig(max_iterations=60, matcher="pallas",
                           pallas_mode="packed6_idx"),
    )
    assert float(f.transform_rmse(res.transform, scene.ground_truth,
                                  scene.source)) < 1e-4
