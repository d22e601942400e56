"""A/B the round-5 decode-kernel levers: bounded stamp + transposed attr.

Validates the full indexed pipeline (adler vs zlib) and times the kernel
alone and the full tail, with and without the transposed attr output.

Usage: [JAX_PLATFORMS=cpu] python tools/ab_twosub.py [B] [H] [W]
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import CheckpointInflator
    from swift_png_tpu.ops.inflate_pallas import decode_stamp_pallas

    import bench as B_

    on_tpu = jax.default_backend() not in ("cpu",)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (8 if on_tpu else 2)
    H = int(sys.argv[2]) if len(sys.argv) > 2 else (512 if on_tpu else 96)
    W = int(sys.argv[3]) if len(sys.argv) > 3 else (512 if on_tpu else 96)
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    datas, bodies, indexes = [], [], []
    for i in range(B):
        data = B_._filtered(B_._image(i, H, W)).tobytes()
        datas.append(data)
        s = native.deflate(data, 6, "zlib", block_terms=1 << 22)
        bodies.append(s[2:-4])
        ix = build_index(s[2:-4], out_size, OB)
        assert ix is not None
        indexes.append(ix)

    eng = CheckpointInflator(ob=OB, backend="pallas")
    out, adler = eng.run(bodies, indexes)
    ok = all(int(adler[i]) == zlib.adler32(datas[i]) for i in range(B))
    arr = np.asarray(out[0][:64])
    ok = ok and bytes(arr.tobytes()) == datas[0][:64]
    print(f"full pipeline adler+head ok={ok}", flush=True)
    assert ok

    if not on_tpu:
        return

    prep = eng.prepare(bodies, indexes)

    def kern(transposed):
        attr, flag, s1, s2 = decode_stamp_pallas(
            prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"], S=prep["S"], ob=OB, transposed=transposed)
        return flag

    def tmin(fn, k=3):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn()
            _ = int(np.asarray(r).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    for tr in (False, True):
        f = kern(tr)
        assert int(np.asarray(f).max()) == 0
        print(f"kernel transposed={tr}: {tmin(lambda: kern(tr))*1e3:8.1f} ms",
              flush=True)

    def full():
        o, a = eng.run(bodies, indexes)
        return a

    t = tmin(lambda: full())
    print(f"full run(): {t*1e3:8.1f} ms  "
          f"{B*out_size/t/1e9:6.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
