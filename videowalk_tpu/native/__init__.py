"""Native (C++) runtime components, built on demand with g++.

The reference leans on third-party native code (fast-slic, scikit-image
Cython, ffmpeg — SURVEY.md §2 native-deps table); this package carries its
own C++ equivalents, compiled once into ``lib<name>.so`` next to the sources
and loaded via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_and_load(name: str) -> ctypes.CDLL:
    """Compile ``<name>.cc`` to ``lib<name>.so`` (if stale) and dlopen it."""
    src = os.path.join(_DIR, f"{name}.cc")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               src, "-o", lib]
        subprocess.run(cmd, check=True, capture_output=True)
    return ctypes.CDLL(lib)
