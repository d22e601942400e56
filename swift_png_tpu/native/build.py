"""Build the native engine: ``python -m swift_png_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["src/spt_native.cpp", "src/spt_deflate.cpp"]
LIB = os.path.join(HERE, "libspt_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", LIB] + [os.path.join(HERE, s) for s in SOURCES]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    print(f"built {LIB}")
    sys.exit(0)
