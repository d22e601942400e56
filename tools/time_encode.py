"""End-to-end timing of the bench's level-9 batched encode region.

timeout 2400 python tools/time_encode.py [B] [trials]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import zlib

    import bench as B_
    from swift_png_tpu.ops.deflate_optimal import (
        batch_layout, deflate_device_optimal_batch, optimal_pipeline_batch)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    H, W = 512, 512
    datas = [B_._filtered(B_._image(i, H, W)).tobytes() for i in range(B)]

    stride, Ntot, _ = batch_layout([len(d) for d in datas])
    ebuf = np.zeros(Ntot, np.uint8)
    for i, d in enumerate(datas):
        ebuf[i * stride: i * stride + len(d)] = np.frombuffer(d, np.uint8)
    edev = jnp.asarray(ebuf)

    s9s = deflate_device_optimal_batch(
        datas, level=9, pitch=W * 4 + 1, bpp=4, interpret=False, dbuf=edev)
    for d, s in zip(datas, s9s):
        assert zlib.decompress(s) == d
    print("roundtrip OK; sizes:", [len(s) for s in s9s], flush=True)
    from swift_png_tpu import native
    if native.available():
        r = len(s9s[0]) / len(native.deflate(datas[0], 9, "zlib"))
        print(f"ratio vs native-9: {r:.4f}", flush=True)

    t9 = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _al, totals, _tr, _ct = optimal_pipeline_batch(
            datas, level=9, pitch=W * 4 + 1, bpp=4,
            interpret=False, dbuf=edev)
        _ = float(np.asarray(totals[-1]))
        t9 = min(t9, time.perf_counter() - t0)
    tot = sum(len(d) for d in datas)
    print(f"encode: {t9*1e3:.1f} ms  {tot/t9/1e6:.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
