"""Batched registration + configuration-matrix smoke tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import fpcr_tpu as f
from fpcr_tpu.models.batch import register_batch


def test_register_batch_recovers_each_pair():
    rng = np.random.default_rng(33)
    B, N = 4, 512
    base = rng.uniform(-1, 1, size=(B, N, 3)).astype(np.float32)
    gts = [f.gt_transform(tuple(rng.uniform(-0.05, 0.05, 3)),
                          tuple(rng.uniform(-0.05, 0.05, 3))) for _ in range(B)]
    targets = jnp.stack([g.apply(jnp.asarray(base[b])) for b, g in enumerate(gts)])
    res = register_batch(jnp.asarray(base), targets,
                         f.ICPConfig(max_iterations=40))
    assert res.transform.rotation.shape == (B, 3, 3)
    for b, g in enumerate(gts):
        tr = f.RigidTransform(res.transform.rotation[b],
                              res.transform.translation[b])
        assert float(f.transform_rmse(tr, g, jnp.asarray(base[b]))) < 1e-4


def test_register_batch_independent_convergence():
    """Elements converge independently: one easy + one hard pair."""
    rng = np.random.default_rng(34)
    base = rng.uniform(-1, 1, size=(2, 400, 3)).astype(np.float32)
    easy = f.gt_transform((0.001, 0.001, 0.0), (0.001, 0.0, 0.001))
    hard = f.gt_transform((0.1, -0.08, 0.05), (0.08, -0.06, 0.04))
    targets = jnp.stack([easy.apply(jnp.asarray(base[0])),
                         hard.apply(jnp.asarray(base[1]))])
    res = register_batch(jnp.asarray(base), targets,
                         f.ICPConfig(max_iterations=60))
    assert bool(np.asarray(res.converged).all())


# configuration matrix: every metric × solver × matcher × robustness combo
# compiles and produces a finite, sensible result on a tiny scene
_METRICS = ["point", "plane"]
_MATCHERS = ["xla", "morton"]
_EXTRAS = [
    {},
    {"solver": "polar"},
    {"robust_loss": "huber"},
    {"max_correspondence_dist": 5.0},
    {"strict_reference": True},
]


@pytest.mark.parametrize(
    "metric,matcher,extra",
    [(m, mt, i) for m in _METRICS for mt in _MATCHERS
     for i in range(len(_EXTRAS))],
)
def test_config_matrix_smoke(metric, matcher, extra):
    kwargs = dict(_EXTRAS[extra])
    if metric == "plane" and kwargs.get("solver") == "polar":
        kwargs.pop("solver")  # solver applies to the point metric only
    cfg = f.ICPConfig(metric=metric, matcher=matcher, max_iterations=15,
                      **kwargs)
    rng = np.random.default_rng(35)
    src = jnp.asarray(rng.uniform(-1, 1, (600, 3)).astype(np.float32))
    gt = f.gt_transform((0.004, -0.003, 0.002), (0.003, -0.002, 0.004))
    res = f.run_icp(src, gt.apply(src), cfg)
    R = np.asarray(res.transform.rotation)
    assert np.isfinite(R).all()
    assert float(f.transform_rmse(res.transform, gt, src)) < 5e-2


def test_pipeline_subsample_spans_whole_cloud():
    """max_points < n < 2*max_points must still sample the WHOLE cloud —
    floor stride degenerated to a prefix truncation (review find r3: the
    default bunny 8171 @ 4096 kept only the first half, biasing the
    coarse pose on scan-ordered clouds)."""
    from fpcr_tpu.models.pipeline import _subsample

    x = jnp.arange(8171, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
    sub = np.asarray(_subsample(x, 4096))[:, 0]
    assert sub.shape[0] <= 4096
    assert sub.max() > 8000  # reaches the tail
    assert sub.min() == 0.0


def test_register_sgd_uses_sgd_defaults():
    """register(method='sgd') without a config keeps run_sgd_icp's tuned
    defaults (200 iters / 1e-5) instead of clobbering them with a plain
    ICPConfig (review find r3) — observable as actually converging."""
    import fpcr_tpu as f

    scene = f.synthetic_scene(width=20)
    res = f.register(scene.source, scene.target, method="sgd")
    err = float(f.transform_rmse(res.transform, scene.ground_truth,
                                 scene.source))
    assert err < 5e-2, err
    assert int(res.num_iterations) > 40  # the plain-ICPConfig cap
