"""Scan-sequence odometry (models/odometry.py): T-1 pairwise registrations
vmapped into one program + associative-scan pose accumulation."""

import numpy as np

import jax.numpy as jnp

import fpcr_tpu as f


def _trajectory(base, steps):
    """frames[t] = G_t^{-1}(base) for an accumulating pose G_t."""
    frames = [base]
    G = f.RigidTransform.identity()
    gts = [G]
    for (t, r) in steps:
        inc = f.gt_transform(t, r)
        G = G.compose(inc)  # G_{t+1} = G_t ∘ inc
        gts.append(G)
        frames.append(G.inverse().apply(base))
    return jnp.stack(frames), gts


def test_register_sequence_recovers_trajectory():
    base = f.synthetic_scene(width=24).source
    steps = [((0.02, -0.01, 0.015), (0.01, -0.02, 0.01)),
             ((-0.015, 0.02, 0.01), (0.015, 0.01, -0.02)),
             ((0.01, 0.01, -0.02), (-0.01, 0.02, 0.015)),
             ((0.02, -0.02, 0.01), (0.02, -0.01, 0.01))]
    frames, gts = _trajectory(base, steps)
    res = f.register_sequence(frames, f.ICPConfig(max_iterations=40))
    assert res.poses.shape == (5, 4, 4)
    np.testing.assert_allclose(np.asarray(res.poses[0]), np.eye(4), atol=1e-7)
    assert bool(jnp.all(res.relative.converged))
    # final accumulated pose matches the ground-truth trajectory
    for t in (1, 4):
        est = res.pose(t)
        err = float(f.transform_rmse(est, gts[t], base))
        assert err < 1e-4, (t, err)


def test_register_sequence_validates_shape():
    import pytest

    with pytest.raises(ValueError):
        f.register_sequence(jnp.zeros((1, 8, 3)))


def test_build_map_fuses_frames():
    """Map fusion: frames transformed by GT poses fuse back into the
    original world — the map's chamfer distance to the world cloud is at
    the voxel-quantization scale, and duplicate coverage deduplicates."""
    import numpy as np

    from fpcr_tpu.models.pose_graph import se3_exp

    rng = np.random.default_rng(0)
    world = np.asarray(f.synthetic_scene(width=24).source)  # 576 pts
    T = 4
    frames, poses = [], []
    M = np.eye(4, dtype=np.float32)
    for t in range(T):
        if t:
            step = np.asarray(se3_exp(jnp.asarray(np.concatenate([
                0.05 * rng.standard_normal(3),
                0.03 * rng.standard_normal(3)]).astype(np.float32))))
            M = (M @ step).astype(np.float32)
        poses.append(M)
        R, tt = M[:3, :3], M[:3, 3]
        frames.append(((world - tt) @ R).astype(np.float32))
    pts, valid = f.build_map(jnp.stack([jnp.asarray(fr) for fr in frames]),
                             jnp.asarray(np.stack(poses)), voxel_size=0.05)
    got = np.asarray(pts)[np.asarray(valid)]
    # T perfectly-posed copies of the same world dedupe to ~|world| voxels
    assert got.shape[0] < 1.5 * world.shape[0]
    d = ((got[:, None, :] - world[None, :, :]) ** 2).sum(-1)
    assert float(np.sqrt(d.min(1).max())) < 0.05  # within one voxel


def test_build_map_masked_and_validated():
    """Pad rows must not fuse into the map; bad shapes raise clearly."""
    import numpy as np

    world = np.asarray(f.synthetic_scene(width=16).source)  # 256 pts
    frames = jnp.stack([jnp.asarray(world), jnp.asarray(world)])
    poses = jnp.stack([jnp.eye(4), jnp.eye(4)])
    # frame 1's second half is padding at a junk location
    junk = np.array(frames)  # writable copy
    junk[1, 128:] = 77.0
    masks = jnp.asarray(np.stack([np.ones(256, bool),
                                  np.r_[np.ones(128, bool),
                                        np.zeros(128, bool)]]))
    pts, valid = f.build_map(jnp.asarray(junk), poses, 0.05, masks)
    got = np.asarray(pts)[np.asarray(valid)]
    assert float(np.abs(got).max()) < 10.0  # no phantom voxels at 77
    import pytest as _pt
    with _pt.raises(ValueError, match="poses must be"):
        f.build_map(frames, poses[:1], 0.05)
    with _pt.raises(ValueError, match="frames must be"):
        f.build_map(frames[0], poses, 0.05)
