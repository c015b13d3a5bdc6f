"""Morton windowed matcher: code properties, match quality, ICP integration."""

import numpy as np
import jax.numpy as jnp
import pytest

import fpcr_tpu as f
from fpcr_tpu.ops.morton import (
    build_morton_table,
    morton_codes,
    morton_nn,
    source_morton_order,
)


def np_nn(p, q):
    d = ((p[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), d.min(1)


def test_morton_codes_locality():
    """Adjacent grid points get nearby codes; code is monotone per axis at
    fixed other axes."""
    lo = jnp.zeros(3)
    inv = jnp.ones(3)
    pts = jnp.asarray([[0.1, 0.1, 0.1], [0.1, 0.1, 0.11], [0.9, 0.9, 0.9]],
                      dtype=jnp.float32)
    c = np.asarray(morton_codes(pts, lo, inv))
    assert abs(int(c[0]) - int(c[1])) < abs(int(c[0]) - int(c[2]))
    assert (c >= 0).all()


def test_morton_table_sorted():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1, 1, (500, 3)).astype(np.float32))
    t = build_morton_table(q)
    codes = np.asarray(t.codes_sorted)
    assert (np.diff(codes) >= 0).all()
    # orig_index is a permutation
    assert sorted(np.asarray(t.orig_index).tolist()) == list(range(500))


def test_morton_nn_quality_near_registered():
    """Near-registered clouds: high exact-NN agreement with brute force, and
    the (rare) misses are still near-nearest in aggregate."""
    rng = np.random.default_rng(4)
    q = rng.uniform(-2, 2, size=(6000, 3)).astype(np.float32)
    p = (q + rng.normal(scale=0.002, size=q.shape)).astype(np.float32)

    table = build_morton_table(jnp.asarray(q))
    order = source_morton_order(jnp.asarray(p), table)
    p_sorted = jnp.take(jnp.asarray(p), order, axis=0)

    matched, dmin, idx_sorted, _ = morton_nn(p_sorted, table,
                                             chunk=256, window=512)
    ref_idx, ref_d = np_nn(np.asarray(p_sorted), q)
    got_idx = np.asarray(table.orig_index)[np.asarray(idx_sorted)]
    agree = (got_idx == ref_idx).mean()
    assert agree > 0.98, agree
    # the tail of misses is small: <2% of rows land farther than 2x the true
    # NN distance (squared: 4x)
    bad = (np.asarray(dmin) > np.maximum(4.0 * ref_d, 1e-10)).mean()
    assert bad < 0.02, bad


def test_morton_nn_matched_points_consistent():
    rng = np.random.default_rng(5)
    q = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    p = (q[:1000] + 0.001).astype(np.float32)
    table = build_morton_table(jnp.asarray(q))
    order = source_morton_order(jnp.asarray(p), table)
    p_sorted = jnp.take(jnp.asarray(p), order, axis=0)
    matched, dmin, idx_sorted, _ = morton_nn(p_sorted, table)
    # matched points == target rows at idx
    np.testing.assert_allclose(
        np.asarray(matched),
        q[np.asarray(table.orig_index)[np.asarray(idx_sorted)]],
        atol=0,
    )
    # distances consistent with matched points
    d_check = ((np.asarray(p_sorted) - np.asarray(matched)) ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(dmin), d_check, rtol=1e-3, atol=1e-6)


def test_morton_nn_with_target_mask():
    rng = np.random.default_rng(6)
    q = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    mask[1000:] = False
    table = build_morton_table(jnp.asarray(q), jnp.asarray(mask))
    p = (q[:500] + 0.001).astype(np.float32)
    order = source_morton_order(jnp.asarray(p), table)
    p_sorted = jnp.take(jnp.asarray(p), order, axis=0)
    _, _, idx_sorted, _ = morton_nn(p_sorted, table)
    orig = np.asarray(table.orig_index)[np.asarray(idx_sorted)]
    assert (orig < 1000).all()


def test_icp_morton_matcher_point_metric():
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.uniform(-2, 2, (8000, 3)).astype(np.float32))
    gt = f.gt_transform((0.004, -0.003, 0.002), (0.002, -0.003, 0.002))
    tgt = gt.apply(src)
    res = f.run_icp(src, tgt, f.ICPConfig(matcher="morton", max_iterations=30))
    assert float(f.transform_rmse(res.transform, gt, src)) < 1e-4
    # points output is un-permuted back to input order
    np.testing.assert_allclose(np.asarray(res.points), np.asarray(tgt),
                               atol=1e-2)


def test_icp_morton_matcher_plane_metric():
    scene = f.synthetic_scene(width=40)
    gt = f.gt_transform((0.005, -0.004, 0.003), (0.004, -0.002, 0.003))
    tgt = gt.apply(scene.source)
    res = f.run_icp(scene.source, tgt,
                    f.ICPConfig(metric="plane", matcher="morton",
                                max_iterations=30))
    assert float(f.transform_rmse(res.transform, gt, scene.source)) < 1e-4


def test_coarse_to_fine_with_morton_default():
    from fpcr_tpu.models.pipeline import icp_coarse_to_fine

    scene = f.synthetic_scene(width=64)
    res = icp_coarse_to_fine(scene.source, scene.target, coarse_points=1024)
    assert float(f.transform_rmse(res.transform, scene.ground_truth, scene.source)) < 5e-4


def test_morton_pallas_impl_matches_xla_impl():
    """morton_impl='pallas' (interpret on CPU) equals morton_impl='xla'."""
    rng = np.random.default_rng(9)
    src = jnp.asarray(rng.uniform(-2, 2, (2048, 3)).astype(np.float32))
    gt = f.gt_transform((0.004, -0.003, 0.002), (0.002, -0.003, 0.002))
    tgt = gt.apply(src)
    res_x = f.run_icp(src, tgt, f.ICPConfig(matcher="morton", max_iterations=10,
                                            morton_impl="xla"))
    res_p = f.run_icp(src, tgt, f.ICPConfig(matcher="morton", max_iterations=10,
                                            morton_impl="pallas"))
    np.testing.assert_allclose(np.asarray(res_x.transform.rotation),
                               np.asarray(res_p.transform.rotation), atol=1e-6)
    ni = int(res_x.num_iterations)
    np.testing.assert_allclose(np.asarray(res_x.errors)[:ni],
                               np.asarray(res_p.errors)[:int(res_p.num_iterations)],
                               atol=1e-6)


def test_morton_pallas_impl_plane_metric():
    scene = f.synthetic_scene(width=32)
    gt = f.gt_transform((0.005, -0.004, 0.003), (0.004, -0.002, 0.003))
    tgt = gt.apply(scene.source)
    res = f.run_icp(scene.source, tgt,
                    f.ICPConfig(metric="plane", matcher="morton",
                                morton_impl="pallas", max_iterations=20))
    assert float(f.transform_rmse(res.transform, gt, scene.source)) < 1e-4


def test_morton_tiny_cloud_smaller_than_chunk():
    rng = np.random.default_rng(12)
    src = jnp.asarray(rng.uniform(-1, 1, (50, 3)).astype(np.float32))
    gt = f.gt_transform((0.01, -0.01, 0.005), (0.01, -0.005, 0.01))
    res = f.run_icp(src, gt.apply(src),
                    f.ICPConfig(matcher="morton", max_iterations=30))
    assert float(f.transform_rmse(res.transform, gt, src)) < 1e-3


def test_morton_pallas_tiny_cloud():
    rng = np.random.default_rng(13)
    src = jnp.asarray(rng.uniform(-1, 1, (50, 3)).astype(np.float32))
    gt = f.gt_transform((0.01, -0.01, 0.005), (0.01, -0.005, 0.01))
    res = f.run_icp(src, gt.apply(src),
                    f.ICPConfig(matcher="morton", morton_impl="pallas",
                                max_iterations=30))
    assert float(f.transform_rmse(res.transform, gt, src)) < 1e-3


def test_morton_source_larger_than_target():
    rng = np.random.default_rng(14)
    tgt_pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    src = jnp.asarray(np.repeat(tgt_pts, 3, axis=0) +
                      rng.normal(scale=1e-3, size=(1500, 3)).astype(np.float32))
    res = f.run_icp(src, jnp.asarray(tgt_pts),
                    f.ICPConfig(matcher="morton", max_iterations=10))
    assert np.isfinite(np.asarray(res.transform.rotation)).all()


def test_knn_morton_matches_exact_knn():
    from fpcr_tpu.ops.morton import knn_morton
    from fpcr_tpu.ops.normals import knn

    rng = np.random.default_rng(25)
    q = jnp.asarray(rng.uniform(-2, 2, (4000, 3)).astype(np.float32))
    idx_m, d_m = knn_morton(q, 5, window=512)
    idx_e, d_e = knn(q, q, 5)
    # self in slot 0 everywhere
    np.testing.assert_array_equal(np.asarray(idx_m)[:, 0], np.arange(4000))
    # high set-overlap with the exact neighbor sets (banded search misses a
    # tail of k-th neighbors near curve seams; normals quality is asserted
    # by the companion test)
    set_overlap = np.mean([
        len(set(a) & set(b)) / 5.0
        for a, b in zip(np.asarray(idx_m), np.asarray(idx_e))
    ])
    assert set_overlap > 0.95, set_overlap
    # distances of the found neighbors are close to the exact ones
    np.testing.assert_allclose(
        np.asarray(d_m).mean(), np.asarray(d_e).mean(), rtol=0.05)


def test_knn_morton_normals_equivalent():
    """Normals from banded kNN match exact-kNN normals (up to sign)."""
    from fpcr_tpu.ops.morton import knn_morton
    from fpcr_tpu.ops.eigh3 import smallest_eigenvector

    scene = f.synthetic_scene(width=40)
    q = scene.target
    idx_all, _ = knn_morton(q, 5, window=512)
    nbrs = jnp.take(q, idx_all[:, 1:], axis=0)
    dev = nbrs - jnp.mean(nbrs, axis=1, keepdims=True)
    cov = jnp.einsum("mki,mkj->mij", dev, dev)
    n_banded, _ = smallest_eigenvector(cov)

    from fpcr_tpu.ops.normals import estimate_normals
    n_exact = estimate_normals(q, k=4)
    dots = np.abs((np.asarray(n_banded) * np.asarray(n_exact)).sum(1))
    assert np.quantile(dots, 0.02) > 0.95


def test_morton_dual_shift_improves_match_quality():
    """morton_shifts=2 (half-cell-shifted second curve) reduces window-miss
    distance inflation on a random volumetric cloud."""
    rng = np.random.default_rng(44)
    src = jnp.asarray(rng.uniform(-2, 2, (8000, 3)).astype(np.float32))
    gt = f.gt_transform((0.004, -0.003, 0.002), (0.002, -0.003, 0.002))
    tgt = gt.apply(src)
    r1 = f.run_icp(src, tgt, f.ICPConfig(matcher="morton", max_iterations=20,
                                         morton_window=128, morton_shifts=1))
    r2 = f.run_icp(src, tgt, f.ICPConfig(matcher="morton", max_iterations=20,
                                         morton_window=128, morton_shifts=2))
    e1 = float(f.transform_rmse(r1.transform, gt, src))
    e2 = float(f.transform_rmse(r2.transform, gt, src))
    # both converge; at this window both land at the numerical noise floor
    # (~1e-7), so assert absolute quality rather than a ratio
    assert e1 < 5e-4 and e2 < 5e-4
