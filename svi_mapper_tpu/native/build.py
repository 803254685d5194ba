"""Build the native runtime shared library with g++.

The library is rebuilt automatically (by :mod:`svi_mapper_tpu.native`) when
any source file is newer than the built ``.so``; no build system beyond g++
is needed (the reference uses CMake for the same role, CMakeLists.txt:1-160).
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
SRC_DIR = _DIR / "src"
LIB_PATH = _DIR / "libsvi_native.so"
SOURCES = [SRC_DIR / "svi_native.cpp"]
HEADERS = sorted(SRC_DIR.glob("*.hpp"))


def is_stale() -> bool:
    if not LIB_PATH.exists():
        return True
    lib_mtime = LIB_PATH.stat().st_mtime
    return any(p.stat().st_mtime > lib_mtime for p in SOURCES + HEADERS)


def build(force: bool = False) -> Path:
    """Compile ``libsvi_native.so`` if missing or stale; return its path."""
    if force or is_stale():
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            "-Wall", "-Wextra",
            *[str(s) for s in SOURCES],
            "-o", str(LIB_PATH),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB_PATH


if __name__ == "__main__":
    print(build(force=True))
