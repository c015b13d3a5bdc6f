"""Loader for the native C++ IO extension (_fpcr_io), with auto-build.

The extension provides the hot ASCII tokenizers for the data layer (the
reference's equivalent code is C++ — readData / Read_data). If the compiled
module is missing, it is built once with the system compiler into
``native/_build``; all callers fall back to pure-numpy parsing on any
failure, so the framework never hard-requires the toolchain.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_BUILD_DIR = _NATIVE_DIR / "_build"
_SOURCE = _NATIVE_DIR / "fpcr_io.cc"

_module = None
_build_attempted = False


def _so_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _BUILD_DIR / f"_fpcr_io{suffix}"


def _build() -> Optional[Path]:
    so = _so_path()
    if so.exists() and so.stat().st_mtime >= _SOURCE.stat().st_mtime:
        return so
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}",
        str(_SOURCE), "-o", str(so),
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return so


def _load():
    global _module, _build_attempted
    if _module is not None or _build_attempted:
        return _module
    _build_attempted = True
    try:
        so = _build()
        sys.path.insert(0, str(_BUILD_DIR))
        try:
            import _fpcr_io  # type: ignore

            _module = _fpcr_io
        finally:
            sys.path.pop(0)
    except Exception:
        _module = None
    return _module


def available() -> bool:
    return _load() is not None


def read_xyz(path: str) -> np.ndarray:
    """Parse an x y z cloud file (whitespace/';'/',' separated) → [N,3] f32
    via the native tokenizer. Raises on failure (callers fall back)."""
    mod = _load()
    if mod is None:
        raise RuntimeError("native IO extension unavailable")
    raw = mod.parse_floats(str(path))
    arr = np.frombuffer(raw, dtype="<f4")
    if arr.size % 3 != 0:
        raise ValueError(f"{path}: token count {arr.size} not divisible by 3")
    return arr.reshape(-1, 3).copy()


def read_int_lines(path: str) -> np.ndarray:
    """Parse all integer tokens (Ouster packet byte dump) → int64 array."""
    mod = _load()
    if mod is None:
        raise RuntimeError("native IO extension unavailable")
    raw = mod.parse_ints(str(path))
    return np.frombuffer(raw, dtype="<i8").copy()
