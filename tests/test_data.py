"""Data layer: Bunny CSV loaders, Ouster packet parser, polar→Cartesian."""

import numpy as np
import jax.numpy as jnp
import pytest

from fpcr_tpu.data.bunny import bunny_scene, load_bunny, load_xyz_csv
from fpcr_tpu.data.ouster import (
    hall_scene,
    load_hall_scan,
    parse_beam_intrinsics,
    parse_packets,
    polar_to_cartesian,
)


def test_load_bunny_resampled():
    pts = np.asarray(load_bunny(resampled=True))
    assert pts.shape == (8171, 3)
    # bunny is ~10-15cm tall, coordinates in a small box
    assert np.abs(pts).max() < 1.0
    assert np.isfinite(pts).all()


def test_load_bunny_full_semicolon_format():
    pts = np.asarray(load_bunny(resampled=False))
    assert pts.shape == (35947, 3)
    assert np.isfinite(pts).all()


def test_load_xyz_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(17, 3)).astype(np.float32)
    p1 = tmp_path / "ws.csv"
    p1.write_text("\n".join(" ".join(f"{v:.6f}" for v in row) for row in data))
    p2 = tmp_path / "semi.csv"
    p2.write_text("\n".join(";".join(f"{v:.6f}" for v in row) for row in data))
    np.testing.assert_allclose(np.asarray(load_xyz_csv(p1)), data, atol=1e-5)
    np.testing.assert_allclose(np.asarray(load_xyz_csv(p2)), data, atol=1e-5)


def test_bunny_scene_gt():
    scene = bunny_scene()
    assert scene.source.shape == scene.target.shape == (8171, 3)
    # target is a rigid transform of source: pairwise distances preserved
    s, t = np.asarray(scene.source), np.asarray(scene.target)
    ds = np.linalg.norm(s[0] - s[100]), np.linalg.norm(s[5] - s[50])
    dt = np.linalg.norm(t[0] - t[100]), np.linalg.norm(t[5] - t[50])
    np.testing.assert_allclose(ds, dt, rtol=1e-4)


def test_beam_intrinsics():
    alt, azi = parse_beam_intrinsics()
    assert alt.shape == azi.shape == (16,)
    # OS1 altitude fan is roughly ±17°, azimuth offsets small
    assert alt.max() < 20 and alt.min() > -20
    assert np.abs(azi).max() < 10


def test_parse_packets():
    frame = parse_packets()
    assert frame.ranges.shape == (16384,)
    assert 0 <= frame.encoder_start < 90112
    # 20-bit ranges in mm: all within [0, 2^20), indoor hall mostly < 60 m
    assert frame.ranges.min() >= 0
    assert frame.ranges.max() < 2 ** 20
    assert np.median(frame.ranges) < 60_000


def test_polar_to_cartesian_analytic():
    """Zero azimuth/altitude and encoder 0 → first return on +x axis; the
    radius is preserved for every return."""
    ranges = np.full(32, 1000.0, np.float32)
    alt = np.zeros(16, np.float32)
    azi = np.zeros(16, np.float32)
    pts = np.asarray(
        polar_to_cartesian(jnp.asarray(ranges), jnp.asarray(0), jnp.asarray(alt), jnp.asarray(azi))
    )
    np.testing.assert_allclose(pts[0], [1000.0, 0.0, 0.0], atol=1e-2)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1000.0, rtol=1e-5)
    # second azimuth block rotates by 88/90112 of a revolution (negative y
    # convention: y = -r sinθ)
    theta = 2 * np.pi * 88.0 / 90112.0
    np.testing.assert_allclose(pts[16], [1000 * np.cos(theta), -1000 * np.sin(theta), 0.0], atol=1e-2)


def test_polar_to_cartesian_altitude():
    ranges = np.full(16, 500.0, np.float32)
    alt = np.full(16, 30.0, np.float32)  # 30° up
    azi = np.zeros(16, np.float32)
    pts = np.asarray(
        polar_to_cartesian(jnp.asarray(ranges), jnp.asarray(0), jnp.asarray(alt), jnp.asarray(azi))
    )
    np.testing.assert_allclose(pts[:, 2], 500 * np.sin(np.deg2rad(30)), rtol=1e-5)


def test_load_hall_scan_meters():
    pts = np.asarray(load_hall_scan())
    assert pts.shape == (16384, 3)
    assert np.isfinite(pts).all()
    r = np.linalg.norm(pts, axis=1)
    # indoor hall: valid returns within tens of meters (zero-range dropouts allowed)
    assert np.median(r) < 60.0
    assert r.max() < 1050.0  # 2^20 mm ≈ 1049 m hard ceiling


def test_hall_scene_rigid():
    scene = hall_scene()
    s, t = np.asarray(scene.source), np.asarray(scene.target)
    assert s.shape == t.shape == (16384, 3)
    i, j = 17, 4093
    np.testing.assert_allclose(
        np.linalg.norm(s[i] - s[j]), np.linalg.norm(t[i] - t[j]), rtol=1e-4
    )
