"""Build the native rANS shared library with g++ (no pip deps)."""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
SRC = _DIR / "rans.cpp"
LIB = _DIR / "librans.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        str(LIB),
        str(SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
