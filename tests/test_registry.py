"""The unified register() front door: every method recovers GT."""

import numpy as np
import pytest

import fpcr_tpu as f


@pytest.fixture(scope="module")
def scene():
    s = f.synthetic_scene(width=32)
    gt = f.gt_transform((0.02, -0.015, 0.01), (0.03, -0.02, 0.015))
    return s.source, gt.apply(s.source), gt


@pytest.mark.parametrize("method,tol", [
    ("point", 1e-5), ("plane", 1e-5), ("symmetric", 1e-5), ("gicp", 1e-5),
    ("ndt", 1e-5), ("coarse_to_fine", 1e-4), ("aa", 1e-5), ("sgd", 2e-3),
])
def test_register_methods_recover_gt(scene, method, tol):
    src, tgt, gt = scene
    res = f.register(src, tgt, method=method, max_iterations=60)
    assert float(f.transform_rmse(res.transform, gt, src)) < tol, method


def test_register_global_from_identityless_pose():
    s = f.synthetic_scene(width=32)
    gt = f.gt_transform((0.1, -0.05, 0.08), (0.3, 0.8, -0.5))
    tgt = gt.apply(s.source)
    res = f.register(s.source, tgt, method="global", max_iterations=40)
    # the saddle scene has a symmetric ambiguity; accept either optimum
    # by checking chamfer-style alignment instead of the transform
    moved = np.asarray(res.transform.apply(s.source))
    d = ((moved[:, None, :] - np.asarray(tgt)[None, :, :]) ** 2).sum(-1)
    assert float(np.sqrt(d.min(1).mean())) < 1e-2


def test_register_validates():
    s = f.synthetic_scene(width=8)
    with pytest.raises(ValueError, match="unknown method"):
        f.register(s.source, s.target, method="bogus")
    with pytest.raises(ValueError, match="not both"):
        f.register(s.source, s.target, config=f.ICPConfig(),
                   max_iterations=5)
