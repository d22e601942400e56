"""Build the native engine: ``python -m swift_png_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["src/spt_native.cpp", "src/spt_deflate.cpp"]
LIB = os.path.join(HERE, "libspt_native.so")


def build(verbose: bool = True) -> str:
    # compile to a temp name and atomically rename: writing the .so in
    # place truncates the inode other live processes have mmap'd (their
    # code pages turn to garbage → SIGSEGV); rename leaves old mappings
    # on the old inode
    tmp = LIB + f".tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", tmp] + [os.path.join(HERE, s) for s in SOURCES]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return LIB


if __name__ == "__main__":
    build()
    print(f"built {LIB}")
    sys.exit(0)
