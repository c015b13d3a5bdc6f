"""End-to-end point-to-plane ICP on the synthetic surface."""

import numpy as np
import pytest

import fpcr_tpu as f
from fpcr_tpu.ops.normals import estimate_normals


def test_icp_plane_recovers_gt_width32():
    """Plane-metric ICP with on-device normals prepass (k=4, the reference
    default) recovers the GT transform on the synthetic scene
    (/root/reference/src/CUDA/ICP_point_to_plane_clean.cu pipeline)."""
    scene = f.synthetic_scene(width=32)
    res = f.icp_point_to_plane(
        scene.source, scene.target, config=f.ICPConfig(metric="plane", max_iterations=60)
    )
    assert bool(res.converged)
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_icp_plane_with_precomputed_normals():
    scene = f.synthetic_scene(width=24)
    normals = estimate_normals(scene.target, k=4)
    res = f.run_icp(
        scene.source, scene.target,
        f.ICPConfig(metric="plane", max_iterations=60),
        target_normals=normals,
    )
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_icp_plane_converges_faster_than_point_on_smooth_scene():
    """Plane metric's linearized solve should need no more iterations than
    point-to-point on a smooth surface (the usual ICP result)."""
    scene = f.synthetic_scene(width=24)
    res_pt = f.icp_point_to_point(scene.source, scene.target,
                                  config=f.ICPConfig(max_iterations=100))
    res_pl = f.icp_point_to_plane(scene.source, scene.target,
                                  config=f.ICPConfig(metric="plane", max_iterations=100))
    assert int(res_pl.num_iterations) <= int(res_pt.num_iterations)


def test_icp_plane_error_is_point_metric():
    """Reference quirk kept: the reported error is the point RMSE even in
    plane mode (ICP_point_to_plane_clean.cu:684-688) — so the error sequence
    is comparable across metrics and decays to ~0 on the oracle scene."""
    scene = f.synthetic_scene(width=24)
    res = f.icp_point_to_plane(scene.source, scene.target,
                               config=f.ICPConfig(metric="plane", max_iterations=60))
    errs = np.asarray(res.errors)
    ni = int(res.num_iterations)
    assert errs[ni - 1] < 1e-4
