"""End-to-end point-to-point ICP: GT recovery + reference convergence semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

import fpcr_tpu as f


def test_synthetic_scene_shapes():
    scene = f.synthetic_scene(width=32)
    assert scene.source.shape == (1024, 3)
    assert scene.target.shape == (1024, 3)
    # z = x² - y² at the corners
    src = np.asarray(scene.source)
    assert src[0, 2] == pytest.approx(src[0, 0] ** 2 - src[0, 1] ** 2, abs=1e-5)


def test_icp_p2p_recovers_gt_width32():
    """The reference oracle: error sequence decays to ~0 and the recovered
    transform inverts the GT one (/root/reference/src/ICP_point_to_point.cu:182-190)."""
    scene = f.synthetic_scene(width=32)
    res = f.icp_point_to_point(
        scene.source, scene.target, config=f.ICPConfig(max_iterations=60)
    )
    assert bool(res.converged)
    errs = np.asarray(res.errors)
    ni = int(res.num_iterations)
    assert errs[ni - 1] < 1e-5
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-5


def test_icp_p2p_small_perturbation_fast():
    scene = f.synthetic_scene(width=16)
    gt = f.gt_transform((0.02, -0.01, 0.015), (0.01, -0.02, 0.005))
    res = f.icp_point_to_point(scene.source, gt.apply(scene.source))
    assert int(res.num_iterations) <= 5
    assert float(f.transform_rmse(res.transform, gt, scene.source)) < 1e-5


def test_icp_errors_monotone_ish_and_nan_padded():
    scene = f.synthetic_scene(width=16)
    res = f.icp_point_to_point(scene.source, scene.target,
                               config=f.ICPConfig(max_iterations=50))
    errs = np.asarray(res.errors)
    ni = int(res.num_iterations)
    assert np.all(np.isfinite(errs[:ni]))
    assert np.all(np.isnan(errs[ni:]))
    # ICP point-metric error is non-increasing in exact arithmetic
    assert errs[0] >= errs[ni - 1]


def test_icp_strict_reference_mode_matches_default_on_benign_scene():
    """No reflections in the benign synthetic scene, so strict reference math
    (no det fix) must land on the same transform (SURVEY.md §8)."""
    scene = f.synthetic_scene(width=16)
    res_a = f.icp_point_to_point(scene.source, scene.target,
                                 config=f.ICPConfig(max_iterations=60))
    res_b = f.icp_point_to_point(
        scene.source, scene.target,
        config=f.ICPConfig(max_iterations=60, strict_reference=True),
    )
    np.testing.assert_allclose(np.asarray(res_a.transform.rotation),
                               np.asarray(res_b.transform.rotation), atol=1e-6)


def test_icp_polar_solver_converges():
    scene = f.synthetic_scene(width=16)
    res = f.icp_point_to_point(
        scene.source, scene.target,
        config=f.ICPConfig(max_iterations=60, solver="polar"),
    )
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_icp_with_masks_padded_clouds():
    """Padded (static-shape) clouds with masks reach the same answer."""
    scene = f.synthetic_scene(width=16)
    src = f.pad_cloud(scene.source, multiple=512)
    tgt = f.pad_cloud(scene.target, multiple=512, pad_value=1e6)
    res = f.run_icp(
        src.points, tgt.points,
        f.ICPConfig(max_iterations=60),
        source_mask=src.mask, target_mask=tgt.mask,
    )
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_icp_trimmed_rejects_outliers():
    """max_correspondence_dist masks gross outliers out of the solve."""
    rng = np.random.default_rng(5)
    scene = f.synthetic_scene(width=16)
    target = np.asarray(scene.target)
    # corrupt the target with far-away junk points
    junk = rng.uniform(50, 60, size=(64, 3)).astype(np.float32)
    target_aug = np.concatenate([target, junk])
    res = f.icp_point_to_point(
        scene.source, jnp.asarray(target_aug),
        config=f.ICPConfig(max_iterations=60, max_correspondence_dist=5.0),
    )
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_icp_convergence_iteration_caps():
    """Reference cap semantics: loop stops at max_iterations when not converged."""
    scene = f.synthetic_scene(width=16)
    res = f.icp_point_to_point(
        scene.source, scene.target,
        config=f.ICPConfig(max_iterations=3, tolerance=0.0),
    )
    assert int(res.num_iterations) == 3
    assert not bool(res.converged)


@pytest.mark.parametrize("loss", ["huber", "tukey"])
def test_icp_robust_loss_with_outlier_corruption(loss):
    """IRLS reweighting recovers GT despite corrupted target points that a
    plain solve would absorb."""
    rng = np.random.default_rng(17)
    scene = f.synthetic_scene(width=20)
    target = np.asarray(scene.target).copy()
    # corrupt 5% of target points in place (matched outliers, not junk far away)
    bad = rng.choice(len(target), size=len(target) // 20, replace=False)
    target[bad] += rng.normal(scale=0.5, size=(len(bad), 3))
    res = f.icp_point_to_point(
        scene.source, jnp.asarray(target),
        config=f.ICPConfig(max_iterations=60, robust_loss=loss),
    )
    res_plain = f.icp_point_to_point(
        scene.source, jnp.asarray(target),
        config=f.ICPConfig(max_iterations=60),
    )
    e_robust = float(f.transform_rmse(res.transform, scene.ground_truth, scene.source))
    e_plain = float(f.transform_rmse(res_plain.transform, scene.ground_truth, scene.source))
    assert e_robust < e_plain
    assert e_robust < 5e-3


def test_icp_robust_loss_clean_scene_unaffected():
    scene = f.synthetic_scene(width=16)
    res = f.icp_point_to_point(scene.source, scene.target,
                               config=f.ICPConfig(max_iterations=60,
                                                  robust_loss="huber"))
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_icp_config_rejects_bad_robust_loss():
    with pytest.raises(ValueError):
        f.ICPConfig(robust_loss="l1")


def test_icp_partial_overlap_trimmed():
    """Source covers only part of the target's region: trimming + robust
    weights still recover the transform."""
    rng = np.random.default_rng(19)
    full = rng.uniform(-2, 2, size=(4000, 3)).astype(np.float32)
    src_region = full[full[:, 0] < 0.5]  # ~60% overlap region
    gt = f.gt_transform((0.02, -0.03, 0.01), (0.02, -0.01, 0.03))
    tgt = gt.apply(jnp.asarray(full))
    res = f.icp_point_to_point(
        jnp.asarray(src_region), tgt,
        config=f.ICPConfig(max_iterations=60, robust_loss="tukey"),
    )
    assert float(f.transform_rmse(res.transform, gt, jnp.asarray(src_region))) < 5e-3
