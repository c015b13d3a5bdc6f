"""Similarity registration: Umeyama solve (TPAMI 1991) + scaled-ICP loop —
beyond-reference model family (the reference is rigid-only Kabsch)."""

import numpy as np

import jax.numpy as jnp

import fpcr_tpu as f


def _similarity_apply(s, R, t, pts):
    return s * pts @ np.asarray(R).T + np.asarray(t)


def test_umeyama_known_correspondences():
    rng = np.random.default_rng(7)
    p = rng.normal(size=(500, 3)).astype(np.float32)
    gt = f.gt_transform((0.2, -0.1, 0.3), (0.3, -0.2, 0.25))
    s_true = 1.37
    q = s_true * np.asarray(gt.apply(jnp.asarray(p)))
    s, tr = f.umeyama_transform(jnp.asarray(p), jnp.asarray(q))
    assert abs(float(s) - s_true) < 1e-4
    rec = _similarity_apply(float(s), tr.rotation, tr.translation, p)
    np.testing.assert_allclose(rec, q, atol=1e-3)


def test_umeyama_without_scale_is_kabsch():
    rng = np.random.default_rng(8)
    p = rng.normal(size=(300, 3)).astype(np.float32)
    gt = f.gt_transform((0.05, 0.1, -0.08), (0.1, 0.05, -0.1))
    q = np.asarray(gt.apply(jnp.asarray(p)))
    s, tr = f.umeyama_transform(jnp.asarray(p), jnp.asarray(q),
                                with_scale=False)
    assert float(s) == 1.0
    kab = f.kabsch_transform(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(tr.rotation),
                               np.asarray(kab.rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr.translation),
                               np.asarray(kab.translation), atol=1e-5)


def test_umeyama_masked():
    rng = np.random.default_rng(9)
    p = rng.normal(size=(200, 3)).astype(np.float32)
    gt = f.gt_transform((0.1, 0.0, -0.05), (0.05, -0.02, 0.08))
    q = 0.8 * np.asarray(gt.apply(jnp.asarray(p)))
    q_corrupt = q.copy()
    q_corrupt[150:] = 100.0  # gross outliers, masked away
    mask = np.arange(200) < 150
    s, tr = f.umeyama_transform(jnp.asarray(p), jnp.asarray(q_corrupt),
                                jnp.asarray(mask))
    assert abs(float(s) - 0.8) < 1e-4
    rec = _similarity_apply(float(s), tr.rotation, tr.translation, p[:150])
    np.testing.assert_allclose(rec, q[:150], atol=1e-3)


def test_scaled_icp_recovers_similarity():
    # Similarity refinement on a volumetric random cloud. Scale/pose must
    # displace points by less than the cloud's NN spacing so the nearest
    # neighbor IS the true counterpart — on densely sampled surfaces NN
    # matching is scale-blind (matches snap tangentially and the scale
    # estimate collapses to ~1; fundamental to ICP-with-scale, not a bug).
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.uniform(-2, 2, size=(1500, 3)), jnp.float32)
    gt = f.gt_transform((0.01, -0.02, 0.015), (0.01, -0.008, 0.012))
    s_true = 1.04
    target = s_true * gt.apply(src)
    res = f.run_scaled_icp(src, target, f.ICPConfig(max_iterations=60))
    assert bool(res.converged)
    assert abs(float(res.scale) - s_true) < 1e-3
    # the recovered similarity maps the source onto the scaled target
    rec = np.asarray(res.apply(src))
    np.testing.assert_allclose(rec, np.asarray(target), atol=5e-3)


def test_scaled_icp_rigid_degenerate():
    """with_scale=False must match plain rigid ICP behavior."""
    scene = f.synthetic_scene(width=24)
    res = f.run_scaled_icp(scene.source, scene.target,
                           f.ICPConfig(max_iterations=40), with_scale=False)
    assert float(res.scale) == 1.0
    assert float(f.transform_rmse(res.transform, scene.ground_truth,
                                  scene.source)) < 1e-5


def test_scaled_icp_rejects_morton():
    import pytest

    scene = f.synthetic_scene(width=16)
    with pytest.raises(ValueError):
        f.run_scaled_icp(scene.source, scene.target,
                         f.ICPConfig(matcher="morton"))
