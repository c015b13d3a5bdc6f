"""SGD-ICP: stochastic mini-batch registration (arXiv:1907.09133)."""

import numpy as np

import fpcr_tpu as f
from fpcr_tpu.models.sgd_icp import run_sgd_icp


def test_sgd_icp_recovers_gt_synthetic():
    scene = f.synthetic_scene(width=64)  # 4,096 pts, full reference displacement
    res = run_sgd_icp(scene.source, scene.target,
                      f.ICPConfig(max_iterations=400, tolerance=1e-6),
                      batch_size=1024, seed=0)
    assert bool(res.converged)
    assert float(f.transform_rmse(res.transform, scene.ground_truth,
                                  scene.source)) < 1e-5
    # errors are EMA-smoothed batch RMSE: finite and decreasing overall
    ni = int(res.num_iterations)
    e = np.asarray(res.errors)[:ni]
    assert np.isfinite(e).all()
    assert e[-1] < 0.05 * e[0]


def test_sgd_icp_each_step_touches_only_a_batch():
    """The stochastic estimator is deterministic given the seed and robust
    to batch size (within its noise floor)."""
    scene = f.synthetic_scene(width=32)
    r1 = run_sgd_icp(scene.source, scene.target,
                     f.ICPConfig(max_iterations=300, tolerance=1e-6),
                     batch_size=256, seed=3)
    r2 = run_sgd_icp(scene.source, scene.target,
                     f.ICPConfig(max_iterations=300, tolerance=1e-6),
                     batch_size=256, seed=3)
    np.testing.assert_array_equal(np.asarray(r1.transform.rotation),
                                  np.asarray(r2.transform.rotation))
    assert float(f.transform_rmse(r1.transform, scene.ground_truth,
                                  scene.source)) < 1e-4


def test_sgd_icp_bunny_coarse_plus_exact_polish():
    """The production pattern for irregular real scans: SGD-ICP coarse
    alignment (stochastic noise floor ~2e-3 on Bunny) + a short exact
    polish; the composition recovers GT to exact-ICP quality."""
    from fpcr_tpu.data.bunny import bunny_scene

    scene = bunny_scene()
    coarse = run_sgd_icp(scene.source, scene.target,
                         f.ICPConfig(max_iterations=400, tolerance=1e-6),
                         batch_size=1024, seed=0)
    assert float(f.transform_rmse(coarse.transform, scene.ground_truth,
                                  scene.source)) < 5e-3
    polish = f.run_icp(coarse.points, scene.target,
                       f.ICPConfig(max_iterations=20))
    total = polish.transform.compose(coarse.transform)
    assert float(f.transform_rmse(total, scene.ground_truth,
                                  scene.source)) < 1e-5
