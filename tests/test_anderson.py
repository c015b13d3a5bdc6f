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


def test_aa_safeguard_rejects_and_still_converges():
    """Stress the safeguard: a noisy partial-overlap scene where the
    Anderson candidate is rejected at least once, the history restarts
    (Pavlov et al. §III.B semantics), and the run still recovers GT."""
    rng = np.random.default_rng(7)
    base = rng.uniform(-1.0, 1.0, size=(1200, 3)).astype(np.float32)
    gt = f.gt_transform((0.05, -0.03, 0.04), (0.05, -0.04, 0.06))
    target = np.asarray(gt.apply(base))
    # partial overlap: the source only sees 70% of the target's support,
    # plus measurement noise — the error landscape is rough enough that
    # some extrapolations regress
    source = base[:840] + rng.normal(0.0, 5e-3, size=(840, 3)).astype(np.float32)
    cfg = f.ICPConfig(max_iterations=40, max_correspondence_dist=0.3)
    res, accepted = run_aa_icp(source, target, cfg, return_accepted=True)
    ni = int(res.num_iterations)
    acc = np.asarray(accepted)[:ni]
    # the restart path fires: under the LIKE-FOR-LIKE safeguard (both
    # candidates scored by fresh-match RMSE) extrapolations on this rough
    # landscape never genuinely beat the plain step — every one is
    # rejected. (The biased pre-r3 comparison "accepted" some purely
    # because stale-match RMSE overstates the plain step's error.)
    assert (~acc[1:]).any(), acc
    err = float(f.transform_rmse(res.transform, gt, source))
    assert err < 0.01, err

    # ... while on the smooth full-overlap scene acceleration genuinely
    # wins and DOES fire — both safeguard branches are exercised for real
    scene = f.synthetic_scene(width=32)
    res2, acc2 = run_aa_icp(scene.source, scene.target,
                            f.ICPConfig(max_iterations=40),
                            return_accepted=True)
    ni2 = int(res2.num_iterations)
    assert np.asarray(acc2)[:ni2].any()
    assert ni2 < int(f.run_icp(scene.source, scene.target,
                               f.ICPConfig(max_iterations=40)).num_iterations)


def test_aa_eval_error_is_like_for_like_with_trimming():
    """With auto_trim / robust configs the safeguard must compare the
    accelerated candidate under the same trimmed error as the plain step —
    otherwise acceleration is never accepted and AA degrades to plain.
    Huber IRLS weights on the reference scene: the plain trajectory takes
    ~16 iterations, so acceleration has room to fire — and it only fires if
    eval_error applies the same robust weighting.
    """
    scene = f.synthetic_scene(width=24)
    cfg = f.ICPConfig(max_iterations=60, robust_loss="huber")
    plain = f.run_icp(scene.source, scene.target, cfg)
    res, accepted = run_aa_icp(scene.source, scene.target, cfg,
                               return_accepted=True)
    ni = int(res.num_iterations)
    assert np.asarray(accepted)[:ni].any()
    assert ni < int(plain.num_iterations)
    assert float(f.transform_rmse(res.transform, scene.ground_truth,
                                  scene.source)) < 1e-4
