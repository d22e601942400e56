"""A/B harness for the inflate tail: expansion chase + adler variants.

Variants measured on the bench content (B streams of filtered rgba8):
  tail[light]    — production: bounded light chase, heavy fallback
  tail[heavy]    — doubling-over-compacted-slots from the start
  tail[collapse] — dense pointer collapse + RLE fill + _adler_batch
  adler[partials] vs adler[bytes] marginal cost

Usage: python tools/ab_expand.py [B] [trials]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops import inflate_checkpoint as IC
    from swift_png_tpu.ops.inflate_checkpoint import CheckpointInflator

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    from bench import _filtered, _image

    compress = lambda b: native.deflate(b, 6, "zlib", block_terms=1 << 22)
    datas, bodies, indexes = [], [], []
    for i in range(B):
        data = _filtered(_image(i, H, W)).tobytes()
        datas.append(data)
        s = compress(data)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    on_tpu = jax.default_backend() not in ("cpu",)
    eng = CheckpointInflator(ob=OB, backend="pallas" if on_tpu else "xla")
    prep = eng.prepare(bodies, indexes)
    match_total = sum(int(ix.match_bytes) for ix in indexes)
    expand_cap = max(1 << 10, -(-(match_total + 64) // 8192) * 8192)
    seg_total = sum(int(ix.match_segs) for ix in indexes)
    seg_cap = max(1 << 10, -(-(seg_total + 64) // 8192) * 8192)
    nbytes = B * out_size
    print(f"B={B} expand_cap={expand_cap} seg_cap={seg_cap} "
          f"match_frac={match_total/nbytes:.4f}", flush=True)

    import functools

    sc = lambda x: float(np.asarray(x.reshape(-1)[:1])[0])

    def tmin(fn, sync, k=trials):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    import zlib

    def run_variant(name, collapse, chase):
        fn = functools.partial(
            IC.inflate_indexed_pallas, ob=OB, n_streams=B,
            out_size=out_size, expand_cap=expand_cap, S=prep["S"],
            interpret=not on_tpu, seg_cap=seg_cap, collapse=collapse,
            chase=chase)
        args = (prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
                prep["symtab"])
        r = fn(*args)
        out, flag, adler, ovf = r
        assert int(np.asarray(flag).max()) == 0, name
        for i in range(min(B, 4)):
            assert int(np.asarray(adler)[i]) == zlib.adler32(datas[i]), \
                (name, i)
        t = tmin(lambda: fn(*args), lambda r: sc(r[2]))
        print(f"{name:18s} {t*1e3:8.1f} ms  {nbytes/t/1e9:6.3f} GB/s",
              flush=True)

    run_variant("tail[light]", False, "light")
    run_variant("tail[heavy]", False, "heavy")
    run_variant("tail[collapse]", True, "light")


if __name__ == "__main__":
    main()
