"""A/B: level-9 size with 1 vs 2 DP iterations (fractional warm start).

Runs the 28 reference baselines through the device optimal parse with the
iteration count forced, comparing total compressed size.

timeout 3600 python tools/ab_dp_iters.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")

BASE = "/root/reference/Tests/Baselines"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import zlib

    from swift_png_tpu.ops import deflate_optimal as DO
    from swift_png_tpu.lz77.deflate import search_parameters

    def filtered_body(path):
        # the GIMP baseline's own filtered scanlines: concatenated IDAT,
        # inflated — realistic DP input without re-running the filter
        raw = open(path, "rb").read()
        pos, idat = 8, b""
        while pos < len(raw):
            ln = int.from_bytes(raw[pos:pos + 4], "big")
            typ = raw[pos + 4:pos + 8]
            if typ == b"IDAT":
                idat += raw[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        return zlib.decompress(idat)

    names = sorted(os.listdir(BASE))
    datas = [(n, filtered_body(os.path.join(BASE, n))) for n in names]

    orig = search_parameters

    totals = {}
    for iters in (2, 1):
        def patched(level, _orig=orig, _it=iters):
            s, a, g, _ = _orig(level)
            return s, a, g, _it
        DO.search_parameters = patched
        tot = 0
        sizes = []
        for name, body in datas:
            s = DO.deflate_device_optimal(body, level=9, interpret=False)
            assert zlib.decompress(s) == body, name
            tot += len(s)
            sizes.append(len(s))
        totals[iters] = (tot, sizes)
        print(f"iters={iters}: total {tot}", flush=True)
    DO.search_parameters = orig
    t2, s2 = totals[2]
    t1, s1 = totals[1]
    print(f"delta: {100.0 * (t1 - t2) / t2:+.3f} % "
          f"(worst file {max((b - a) / a for a, b in zip(s2, s1)):+.4%})")


if __name__ == "__main__":
    main()
