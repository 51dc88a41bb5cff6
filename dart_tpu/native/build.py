"""Lazy build + load of the dart_tpu native library (C++, via g++).

The native library hosts the host-side hot paths that the reference
implements in C/C++ (suffix-array construction for the index builder;
later: finalization helpers and SAM serialization aids). Compiled once
into the package directory; rebuilt when sources are newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None

SOURCES = ["sais.cpp", "zoo.cpp", "pipeline.cpp", "pack.cpp", "bamenc.cpp",
           "layout.cpp"]


def _tsan() -> bool:
    return os.environ.get("DART_TPU_TSAN") == "1"


def _lib_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    name = "libdart_native_tsan" if _tsan() else "libdart_native"
    return os.path.join(_HERE, name + suffix)


def _needs_build(lib: str) -> bool:
    if not os.path.exists(lib):
        return True
    lib_mtime = os.path.getmtime(lib)
    for src in SOURCES:
        p = os.path.join(_HERE, src)
        if os.path.exists(p) and os.path.getmtime(p) > lib_mtime:
            return True
    return False


def build(force: bool = False) -> str:
    lib = _lib_path()
    with _LOCK:
        if force or _needs_build(lib):
            srcs = [os.path.join(_HERE, s) for s in SOURCES if os.path.exists(os.path.join(_HERE, s))]
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
                "-pthread", *srcs, "-o", lib + ".tmp",
            ]
            if _tsan():
                # thread-sanitized build (separate artifact name, so
                # the production lib is untouched) for auditing the -t
                # pool; exercised by tests/test_tsan.py
                cmd[1:1] = ["-fsanitize=thread", "-g", "-O1"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(lib + ".tmp", lib)
    return lib


def load() -> ctypes.CDLL | None:
    """Load (building if needed). Returns None if no C++ toolchain."""
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        _LIB = ctypes.CDLL(build())
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB
