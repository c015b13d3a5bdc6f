"""Dataset asset resolution.

Assets ship in the repo's ``assets/`` directory (copied data files from the
reference's ``src/CUDA/csv_files/`` — data, not code). Override with
``FPCR_DATA_DIR`` to point at another copy.
"""

from __future__ import annotations

import os
from pathlib import Path

_REPO_ASSETS = Path(__file__).resolve().parents[2] / "assets"
_REFERENCE_ASSETS = Path("/root/reference/src/CUDA/csv_files")


def data_dir() -> Path:
    env = os.environ.get("FPCR_DATA_DIR")
    if env:
        return Path(env)
    if _REPO_ASSETS.is_dir():
        return _REPO_ASSETS
    return _REFERENCE_ASSETS


def asset(name: str) -> Path:
    path = data_dir() / name
    if not path.exists():
        raise FileNotFoundError(
            f"dataset asset {name!r} not found under {data_dir()} "
            "(set FPCR_DATA_DIR to the directory holding the CSV assets)"
        )
    return path
