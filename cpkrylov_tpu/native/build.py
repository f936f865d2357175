"""On-demand build of the native runtime library (ctypes-loaded).

Compiles every ``*.cpp`` in this directory into ``libcpk_native.so`` the
first time it is needed (or when sources are newer than the library).  The
native layer plays the role MATLAB's built-in native code (ldl / sparse
backslash) plays for the reference — see SURVEY.md §2.3.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libcpk_native.so")
_LOCK = threading.Lock()
_handle = None


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    return any(
        os.path.getmtime(os.path.join(_DIR, f)) > lib_mtime
        for f in os.listdir(_DIR)
        if f.endswith(".cpp") or f.endswith(".h")
    )


def build() -> str:
    sources = sorted(
        os.path.join(_DIR, f) for f in os.listdir(_DIR) if f.endswith(".cpp")
    )
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, *sources,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def load() -> ctypes.CDLL | None:
    """Build (if stale) and load the native library; None when unavailable."""
    global _handle
    with _LOCK:
        if _handle is not None:
            return _handle
        try:
            if _needs_build():
                build()
            _handle = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            return None
        return _handle
