"""Stanford Bunny loaders.

The reference ships two bunny files (``src/CUDA/csv_files/``):
  * ``Bunny_res.csv`` — 8,171 points, whitespace-separated (what the drivers
    load, /root/reference/src/CUDA/GPU_point_to_point_bunny.cu:126);
  * ``Bunny.csv`` — 35,947 points, semicolon-separated (full bunny).

The reference's ``readData`` tokenizer only handles the whitespace flavor
(:463-497); here the delimiter is sniffed so both load. A native C++ fast
parser is used when built (fpcr_tpu.utils.native), with a numpy fallback.

Bunny registration scene GT (reference: t=(0.01,-0.04,0.02),
r=(0.15,-0.1,0.05), GPU_point_to_point_bunny.cu:136-144).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from .paths import asset
from .synthetic import RegistrationScene, transformed_scene

BUNNY_GT_TRANSLATION = (0.01, -0.04, 0.02)
BUNNY_GT_ROTATION = (0.15, -0.1, 0.05)


def _parse_xyz_numpy(path: Path) -> np.ndarray:
    text = path.read_text()
    delim = ";" if ";" in text[:200] else None  # None = any whitespace
    if delim is not None:
        text = text.replace(";", " ")
    arr = np.array(text.split(), dtype=np.float32)
    if arr.size % 3 != 0:
        raise ValueError(f"{path}: token count {arr.size} not divisible by 3")
    return arr.reshape(-1, 3)


def load_xyz_csv(path: Union[str, Path]) -> jnp.ndarray:
    """Load an ``x y z`` (whitespace or ';' separated) cloud file → [N,3] f32."""
    path = Path(path)
    try:
        from ..utils.native import read_xyz as native_read_xyz

        pts = native_read_xyz(str(path))
    except Exception:
        pts = _parse_xyz_numpy(path)
    return jnp.asarray(pts, dtype=jnp.float32)


def load_bunny(resampled: bool = True, path: Optional[Union[str, Path]] = None) -> jnp.ndarray:
    """Load the Stanford Bunny cloud (resampled 8,171 pts by default; full
    35,947-pt with ``resampled=False``)."""
    if path is None:
        path = asset("Bunny_res.csv" if resampled else "Bunny.csv")
    return load_xyz_csv(path)


def bunny_scene(resampled: bool = True) -> RegistrationScene:
    """The reference's Bunny registration benchmark: source = bunny,
    target = GT-transformed bunny."""
    pts = load_bunny(resampled=resampled)
    return transformed_scene(pts, BUNNY_GT_TRANSLATION, BUNNY_GT_ROTATION)
