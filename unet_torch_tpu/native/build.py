"""Lazy g++ build of the native extensions (no pybind11 in this image — plain
C ABI + ctypes).  The .so is cached next to the sources and rebuilt whenever
the .cpp is newer."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_shared(name: str) -> str:
    """Compile {name}.cpp -> lib{name}.so if needed; returns the .so path.

    The `lib` prefix keeps the artifact out of Python's import resolution
    (a bare {name}.so would shadow {name}.py as an extension module)."""
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"lib{name}.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)
    return out
