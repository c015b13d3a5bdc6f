"""Ouster OS1-16 LiDAR ingestion: raw packet bytes → Cartesian cloud.

Behavioral re-implementation (vectorized numpy + jnp, no line-by-line port)
of the reference's hall-scan ingest
(/root/reference/src/CUDA/GPU_point_to_plane_real.cu):

* ``Read_data`` (:677-773) walks 806,912 lines of raw packet byte values
  (64 lidar packets x 16 azimuth blocks x 788 lines/block): the initial
  encoder count comes from lines 13/14 of the first packet (lo | hi<<8),
  and each range is a 20-bit word reassembled from 3 bytes at line offset
  ``17 + 12*channel + 788*block + 12608*packet`` (lo | mid<<8 | (hi&0xF)<<16)
  for channels 2, 6, 10, ..., 62 (16 channels, stride 4).
* ``beam_intrinsics.csv``: 64 altitude lines of which every 4th is taken
  (16 OS1-16 beams), same for azimuth (:735-773).
* ``Conversion`` kernel (:20-36): per return i, azimuth block i//16 and
  channel i%16; encoder counter ``(enc0 + block*88) mod 90112``;
  theta = 2π(counter/90112 + azimuth/360), phi = 2π·altitude/360;
  x = r·cosθ·cosφ, y = -r·sinθ·cosφ, z = r·sinφ. Ranges are mm; the driver
  scales clouds by 1e-3 afterwards (:350-352).

Here the packet walk is vectorized gather arithmetic on the int array of
byte values (native C++ parser when available), and the polar→Cartesian
conversion is a jitted jnp op (one fused VPU kernel instead of a CUDA launch).

Hall-scan registration GT: t=(0.001,-0.0202,0.02), r=(0.01,-0.003,0.05)
(:830-844), applied with the same ``rotation_gt`` convention.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .paths import asset
from .synthetic import RegistrationScene, transformed_scene

# OS1-16 frame geometry (1024 azimuth blocks x 16 channels = 16,384 returns)
PACKETS = 64
BLOCKS_PER_PACKET = 16
CHANNELS = 16
LINES_PER_BLOCK = 788
LINES_PER_PACKET = 12608
ENCODER_TICKS_PER_BLOCK = 88
ENCODER_TICKS_PER_REV = 90112

HALL_GT_TRANSLATION = (0.001, -0.0202, 0.02)
HALL_GT_ROTATION = (0.01, -0.003, 0.05)


class OusterFrame(NamedTuple):
    ranges: np.ndarray  # [N] float32, millimeters
    encoder_start: int  # initial encoder counter
    altitude_deg: np.ndarray  # [16]
    azimuth_deg: np.ndarray  # [16]


def _read_byte_lines(path: Path) -> np.ndarray:
    try:
        from ..utils.native import read_int_lines

        return read_int_lines(str(path))
    except Exception:
        return np.array(path.read_text().split(), dtype=np.int64)


def parse_packets(path: Union[str, Path, None] = None) -> OusterFrame:
    """Parse the raw packet byte dump + beam intrinsics into ranges/angles."""
    if path is None:
        path = asset("Donut_1024x16.csv")
    raw = _read_byte_lines(Path(path))

    # encoder counter: 1-indexed lines 13, 14 of the first packet → 0-indexed
    encoder_start = int(raw[12]) | (int(raw[13]) << 8)

    # gather the 3 bytes of every 20-bit range word, fully vectorized:
    pkt = np.arange(PACKETS).reshape(-1, 1, 1)
    blk = np.arange(BLOCKS_PER_PACKET).reshape(1, -1, 1)
    ch = (2 + 4 * np.arange(CHANNELS)).reshape(1, 1, -1)
    # reference line index (1-based): 17 + 12*ch + 788*blk + 12608*pkt
    base = 17 + 12 * ch + LINES_PER_BLOCK * blk + LINES_PER_PACKET * pkt - 1
    lo = raw[base]
    mid = raw[base + 1]
    hi = raw[base + 2]
    ranges = (lo | (mid << 8) | ((hi & 0xF) << 16)).astype(np.float32)
    ranges = ranges.reshape(-1)  # [(pkt, blk, ch) row-major] = return order

    alt, azi = parse_beam_intrinsics()
    return OusterFrame(ranges, encoder_start, alt, azi)


def parse_beam_intrinsics(path: Union[str, Path, None] = None):
    """16 altitude + 16 azimuth beam angles: the file lists 64 of each
    (full OS1-64 table); the OS1-16 uses every 4th
    (/root/reference/src/CUDA/GPU_point_to_plane_real.cu:747-772)."""
    if path is None:
        path = asset("beam_intrinsics.csv")
    lines = Path(path).read_text().splitlines()
    # 1-based: line 1 header, 2..65 altitudes (take j%4==0 → 4,8,...,64);
    # line 67 header, 68..131 azimuths (take (j-66)%4==0 → 70,74,...,130).
    altitude = np.array(
        [float(lines[j - 1]) for j in range(2, 66) if j % 4 == 0], dtype=np.float32
    )
    azimuth = np.array(
        [float(lines[j - 1]) for j in range(68, 132) if (j - 66) % 4 == 0],
        dtype=np.float32,
    )
    if altitude.size != CHANNELS or azimuth.size != CHANNELS:
        raise ValueError("beam intrinsics parse failed")
    return altitude, azimuth


@jax.jit
def polar_to_cartesian(
    ranges: jnp.ndarray,
    encoder_start: jnp.ndarray,
    altitude_deg: jnp.ndarray,
    azimuth_deg: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized spherical→Cartesian conversion (the ``Conversion`` CUDA
    kernel as one fused jnp op). ``ranges`` in any unit; output same unit."""
    n = ranges.shape[0]
    i = jnp.arange(n)
    block = i // CHANNELS
    channel = i % CHANNELS
    counter = (encoder_start + block * ENCODER_TICKS_PER_BLOCK) % ENCODER_TICKS_PER_REV
    theta = 2.0 * jnp.pi * (
        counter.astype(jnp.float32) / ENCODER_TICKS_PER_REV
        + azimuth_deg[channel] / 360.0
    )
    phi = 2.0 * jnp.pi * altitude_deg[channel] / 360.0
    r = ranges.astype(jnp.float32)
    cos_phi = jnp.cos(phi)
    x = r * jnp.cos(theta) * cos_phi
    y = -r * jnp.sin(theta) * cos_phi
    z = r * jnp.sin(phi)
    return jnp.stack([x, y, z], axis=1)


@functools.lru_cache(maxsize=2)
def _load_hall_scan_cached(path_key: Optional[str], meters: bool):
    frame = parse_packets(path_key)
    pts = polar_to_cartesian(
        jnp.asarray(frame.ranges),
        jnp.asarray(frame.encoder_start, dtype=jnp.int32),
        jnp.asarray(frame.altitude_deg),
        jnp.asarray(frame.azimuth_deg),
    )
    if meters:
        pts = pts * 1e-3  # reference's cublasSscal(1e-3) mm→m (:350-352)
    return pts


def load_hall_scan(
    path: Union[str, Path, None] = None, meters: bool = True
) -> jnp.ndarray:
    """The full hall-scan cloud: 16,384 Cartesian points (meters)."""
    return _load_hall_scan_cached(str(path) if path else None, meters)


def hall_scene(meters: bool = True, strict: bool = True) -> RegistrationScene:
    """The reference's real-LiDAR registration benchmark: source = hall scan,
    target = GT-transformed copy (GPU_point_to_plane_real.cu:820-858).

    ``strict=True`` (default) reproduces the reference's operation ORDER:
    ``Read_data`` applies the GT ``RyT`` to the millimeter cloud
    (GPU_point_to_plane_real.cu:851) and only then ``main`` scales both
    clouds by 1e-3 (:350-352) — so the effective meters-space translation
    is ``1e-3 × (0.001, -0.0202, 0.02)``. The rotation commutes with the
    uniform scale and matches exactly either way.

    ``strict=False`` keeps the harder legacy variant (rounds 1-2) that
    applies the full (0.001, -0.0202, 0.02) translation in meters space —
    a 1000× larger translation than the reference's effective one.

    With ``meters=False`` the clouds stay in millimeters and the GT
    translation is applied raw, exactly as the reference's ``RyT`` does
    (``strict`` has no effect: pre-scale IS the mm frame).
    """
    pts = load_hall_scan(meters=meters)
    t = HALL_GT_TRANSLATION
    if strict and meters:
        t = tuple(v * 1e-3 for v in t)
    return transformed_scene(pts, t, HALL_GT_ROTATION)
