"""AA-ICP: Anderson-accelerated registration."""

import numpy as np
import pytest

import fpcr_tpu as f
from fpcr_tpu.models.anderson import run_aa_icp


def test_aa_icp_recovers_gt():
    scene = f.synthetic_scene(width=32)
    res = run_aa_icp(scene.source, scene.target,
                     f.ICPConfig(max_iterations=60))
    assert bool(res.converged)
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-5


def test_aa_icp_fewer_iterations_than_plain():
    """Anderson acceleration's point: fewer iterations on the slow
    point-metric trajectory (reference scene: plain takes ~16-28)."""
    scene = f.synthetic_scene(width=32)
    plain = f.run_icp(scene.source, scene.target, f.ICPConfig(max_iterations=60))
    aa = run_aa_icp(scene.source, scene.target, f.ICPConfig(max_iterations=60))
    assert int(aa.num_iterations) < int(plain.num_iterations)


def test_aa_icp_plane_metric():
    scene = f.synthetic_scene(width=24)
    res = run_aa_icp(scene.source, scene.target,
                     f.ICPConfig(metric="plane", max_iterations=60))
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 1e-4


def test_aa_icp_bunny():
    from fpcr_tpu.data.bunny import bunny_scene

    scene = bunny_scene()
    plain = f.run_icp(scene.source, scene.target, f.ICPConfig(max_iterations=40))
    aa = run_aa_icp(scene.source, scene.target, f.ICPConfig(max_iterations=40))
    assert float(f.transform_rmse(aa.transform, scene.ground_truth, scene.source)) < 1e-5
    assert int(aa.num_iterations) <= int(plain.num_iterations)
