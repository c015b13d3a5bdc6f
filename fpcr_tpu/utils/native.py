"""Loader for the native C++ IO extension (_fpcr_io), with auto-build.

The extension provides the hot ASCII tokenizers for the data layer (the
reference's equivalent code is C++ — readData / Read_data). If the compiled
module is missing, it is built once with the system compiler into
``native/_build``; all callers fall back to pure-numpy parsing on any
failure, so the framework never hard-requires the toolchain.

Hardening (review r3): the compile writes to a temp name and renames on
success (a killed/timed-out g++ must not leave a mtime-fresh corrupt .so
that permanently disables the native path); first-use build/import is
guarded by a lock (two threads racing the build corrupted the artifact and
the sys.path juggling); a prebuilt .so without the shipped source is used
as-is instead of being disabled by the staleness stat.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_BUILD_DIR = _NATIVE_DIR / "_build"
_SOURCE = _NATIVE_DIR / "fpcr_io.cc"

_module = None
_build_attempted = False
_lock = threading.Lock()


def _so_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _BUILD_DIR / f"_fpcr_io{suffix}"


def _build() -> Optional[Path]:
    so = _so_path()
    if not _SOURCE.exists():
        # packaged deployment shipping only the prebuilt extension: use it
        return so if so.exists() else None
    if so.exists() and so.stat().st_mtime >= _SOURCE.stat().st_mtime:
        return so
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    tmp = so.with_name(so.name + f".tmp{os.getpid()}")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}",
        str(_SOURCE), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: never a half-linked .so at `so`
    finally:
        if tmp.exists():
            tmp.unlink()
    return so


def _load():
    global _module, _build_attempted
    if _module is not None or _build_attempted:
        return _module
    with _lock:
        if _module is not None or _build_attempted:
            return _module
        _build_attempted = True
        try:
            so = _build()
            if so is None:
                return None
            # import by explicit file path — no sys.path mutation to race
            spec = importlib.util.spec_from_file_location("_fpcr_io", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _module = mod
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
    # the frombuffer view is read-only, which every caller is fine with
    # (jnp.asarray / gather-indexing copy anyway); an extra .copy() here
    # tripled peak memory on the ingest path
    return arr.reshape(-1, 3)


def read_int_lines(path: str) -> np.ndarray:
    """Parse all integer tokens (Ouster packet byte dump) → int64 array."""
    mod = _load()
    if mod is None:
        raise RuntimeError("native IO extension unavailable")
    raw = mod.parse_ints(str(path))
    return np.frombuffer(raw, dtype="<i8")
