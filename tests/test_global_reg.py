"""Global registration pipeline: oriented normals -> FPFH descriptors ->
mutual feature matching -> batched RANSAC -> ICP refinement
(fpcr_tpu/ops/fpfh.py, fpcr_tpu/models/global_reg.py) — registers clouds
from ARBITRARY initial pose, which the reference cannot do at all (every
reference driver starts from a known-small displacement, SURVEY.md §0)."""

import numpy as np

import jax
import jax.numpy as jnp

import fpcr_tpu as f
from fpcr_tpu.ops.fpfh import fpfh_features
from fpcr_tpu.ops.normals import estimate_normals, orient_normals


def test_orient_normals_centroid():
    scene = f.synthetic_scene(width=16)
    pts = scene.source
    n = orient_normals(pts, estimate_normals(pts, k=8))
    ref = pts - jnp.mean(pts, axis=0, keepdims=True)
    dots = jnp.sum(n * ref, axis=1)
    assert float(jnp.min(dots)) >= 0.0  # all point away from the centroid


def test_orient_normals_viewpoint():
    scene = f.synthetic_scene(width=16)
    pts = scene.source
    vp = jnp.asarray([0.0, 0.0, 100.0])
    n = orient_normals(pts, estimate_normals(pts, k=8), viewpoint=vp)
    dots = jnp.sum(n * (vp[None, :] - pts), axis=1)
    assert float(jnp.min(dots)) >= 0.0  # all point toward the viewpoint


def test_fpfh_shape_and_normalization():
    pts = f.synthetic_scene(width=16).source
    n = orient_normals(pts, estimate_normals(pts, k=8))
    feat = fpfh_features(pts, n, k=8)
    assert feat.shape == (pts.shape[0], 33)
    assert bool(jnp.all(jnp.isfinite(feat)))
    for s in range(3):
        sums = jnp.sum(feat[:, s * 11:(s + 1) * 11], axis=1)
        np.testing.assert_allclose(np.asarray(sums), 1.0, atol=1e-5)


def test_fpfh_rotation_invariance():
    """FPFH is a geometric descriptor: rigidly moving the cloud must leave
    the per-point histograms (nearly) unchanged."""
    # jittered grid: the perfectly regular lattice has many EQUIDISTANT
    # neighbors, so kNN tie-flips under rotation dominate the comparison
    rng = np.random.default_rng(5)
    base = np.asarray(f.synthetic_scene(width=20).source)
    pts = jnp.asarray(base + 0.01 * rng.normal(size=base.shape),
                      jnp.float32)
    gt = f.gt_transform((1.0, -2.0, 0.5), (0.3, 0.7, -0.4))
    pts_r = gt.apply(pts)

    def feats(p):
        n = orient_normals(p, estimate_normals(p, k=8))
        return fpfh_features(p, n, k=8)

    a, b = np.asarray(feats(pts)), np.asarray(feats(pts_r))
    # mass displacement per sub-histogram (L1/2); tie-flips in kNN and bin
    # edges move a little mass, rigid motion must not move much
    l1 = 0.5 * np.abs(a - b).sum(axis=1) / 3.0
    assert float(np.mean(l1)) < 0.02
    assert float(np.max(l1)) < 0.25


def test_global_registration_synthetic_large_pose():
    src = f.synthetic_scene(width=32).source
    gt = f.gt_transform((2.0, 1.0, 0.5), (0.2, -0.3, 0.8))
    tgt = gt.apply(src)
    coarse = f.global_registration(src, tgt)
    assert int(coarse.num_inliers) > 50
    # coarse lands inside the ICP basin
    assert float(f.transform_rmse(coarse.transform, gt, src)) < 0.1
    res = f.register_global(src, tgt, config=f.ICPConfig(max_iterations=40))
    assert float(f.transform_rmse(res.transform, gt, src)) < 1e-5


def test_global_registration_bunny_beats_plain_icp():
    """A 1.2-rad pose traps plain ICP in a local minimum; the FPFH+RANSAC
    pipeline recovers the exact pose."""
    from fpcr_tpu.data.bunny import load_bunny

    src = load_bunny(resampled=True)
    gt = f.gt_transform((0.1, -0.05, 0.08), (0.4, 1.2, -0.8))
    tgt = gt.apply(src)
    plain = f.run_icp(src, tgt, f.ICPConfig(max_iterations=60))
    assert float(f.transform_rmse(plain.transform, gt, src)) > 1e-4
    res = f.register_global(src, tgt, config=f.ICPConfig(max_iterations=40))
    assert float(f.transform_rmse(res.transform, gt, src)) < 1e-6


def test_global_registration_deterministic_key():
    src = f.synthetic_scene(width=24).source
    gt = f.gt_transform((0.5, -1.0, 0.3), (0.1, 0.4, -0.2))
    tgt = gt.apply(src)
    k = jax.random.PRNGKey(7)
    a = f.global_registration(src, tgt, key=k)
    b = f.global_registration(src, tgt, key=k)
    np.testing.assert_array_equal(np.asarray(a.transform.rotation),
                                  np.asarray(b.transform.rotation))


def test_mutual_filter_reduces_correspondences():
    src = f.synthetic_scene(width=24).source
    gt = f.gt_transform((0.5, -1.0, 0.3), (0.1, 0.4, -0.2))
    tgt = gt.apply(src)
    with_f = f.global_registration(src, tgt, mutual=True)
    without = f.global_registration(src, tgt, mutual=False)
    assert int(with_f.num_correspondences) < int(without.num_correspondences)
    assert int(with_f.num_correspondences) > 20


def test_ransac_threshold_robust_to_duplicate_targets():
    """Duplicate-heavy clouds: the auto RANSAC tau must come from the
    positive-spacing median (review find r3: a plain median NN distance
    collapsed to ~1e-15, so no correspondence could ever be an inlier)."""
    from fpcr_tpu.models.global_reg import _estimate_spacing

    rng = np.random.default_rng(17)
    base = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    dup = base[rng.integers(0, 128, 4096)]  # each point ~32x duplicated
    spacing = float(_estimate_spacing(jnp.asarray(dup)))
    assert np.isfinite(spacing) and spacing > 1e-4, spacing
