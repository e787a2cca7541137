"""Loader for the C++ data-path module (native/anystereo_native.cpp).

Builds the extension on first use (g++ via setuptools) and caches it next
to the sources; every caller falls back to the pure-python implementations
when the toolchain is unavailable, so the framework never hard-depends on
the native module.
"""

from __future__ import annotations

import glob
import logging
import os
import subprocess
import sys
from typing import Optional

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_mod = None
_tried = False


def _find_built() -> Optional[str]:
    hits = glob.glob(os.path.join(_NATIVE_DIR, "anystereo_native*.so"))
    return hits[0] if hits else None


def _load():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    so = _find_built()
    if so is None:
        try:
            # serialize the in-place build across processes (grain workers /
            # multi-host launches all hit this lazily); losers of the race
            # block on the lock, then find the winner's .so
            import fcntl

            lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
            with open(lock_path, "w") as lock_f:
                fcntl.flock(lock_f, fcntl.LOCK_EX)
                try:
                    so = _find_built()
                    if so is None:
                        subprocess.run(
                            [sys.executable, "setup.py", "build_ext",
                             "--inplace"],
                            cwd=_NATIVE_DIR,
                            check=True,
                            capture_output=True,
                            timeout=240,
                        )
                        so = _find_built()
                finally:
                    fcntl.flock(lock_f, fcntl.LOCK_UN)
        except Exception as e:  # toolchain missing / build failure → fallback
            log.info("native build unavailable (%s); using python IO", e)
            return None
    if so is None:
        return None
    if _NATIVE_DIR not in sys.path:
        sys.path.insert(0, _NATIVE_DIR)
    try:
        import anystereo_native  # noqa: F401

        _mod = anystereo_native
    except ImportError as e:
        log.info("native import failed (%s); using python IO", e)
        _mod = None
    return _mod


def available() -> bool:
    return _load() is not None


def read_pfm(path: str):
    return _load().read_pfm(path)


def scatter_resize_sparse(flow, valid, fx: float, fy: float):
    return _load().scatter_resize_sparse(flow, valid, float(fx), float(fy))


def sample_queries(values, coords, idx):
    return _load().sample_queries(values, coords, idx)
