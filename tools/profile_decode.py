"""On-chip breakdown of the indexed decode pipeline.

Times, with forced-sync (scalar fetch) discipline:
  1. decode_stamp_pallas alone (kernel)
  2. inflate_indexed_pallas (kernel + XLA tail)
  3. decode_stage on the inflated output (defilter + convolve)
  4. full decode_all

Usage: python tools/profile_decode.py [B] [trials]
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

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (CheckpointInflator,
                                                      inflate_indexed_pallas)
    from swift_png_tpu.ops.inflate_pallas import decode_stamp_pallas
    from swift_png_tpu.parallel.batch import decode_stage

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
    expand_cap = eng._pow2(sum(ix.match_bytes for ix in indexes) + 64,
                           1 << 10)
    seg_cap = eng._pow2(sum(ix.match_segs for ix in indexes) + 64, 1 << 10)
    print(f"B={B} S={prep['S']} tiles={prep['spans3'].shape[0]} "
          f"expand_cap={expand_cap}", flush=True)

    def tmin(fn, sync, k=trials):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    nbytes = B * out_size

    # 1. kernel alone (attr16 variants)
    for a16 in (False, True):
        def kern():
            return decode_stamp_pallas(
                prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
                prep["symtab"], S=prep["S"], ob=OB, interpret=not on_tpu,
                attr16=a16)

        try:
            r = kern()
            t = tmin(kern, lambda r: float(np.asarray(r[1])[0, 0]))
            print(f"kernel attr16={int(a16)} {t*1e3:8.1f} ms  "
                  f"{nbytes/t/1e9:6.3f} GB/s", flush=True)
        except Exception as e:
            print(f"kernel attr16={int(a16)} FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # 2. full inflate
    def inf():
        return inflate_indexed_pallas(
            prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"], ob=OB, n_streams=B, out_size=out_size,
            expand_cap=expand_cap, S=prep["S"], interpret=not on_tpu,
            seg_cap=seg_cap)

    out, flag, adler, ovf = inf()
    assert int(np.asarray(flag).max()) == 0
    import zlib
    for i in range(B):
        assert int(np.asarray(adler)[i]) == zlib.adler32(datas[i]), i
    t_inf = tmin(inf, lambda r: float(np.asarray(r[2])[0]))
    print(f"inflate           {t_inf*1e3:8.1f} ms  "
          f"{nbytes/t_inf/1e9:6.3f} GB/s", flush=True)

    # 3. decode_stage on device-resident filtered rows
    import jax.numpy as jnp

    filt = jnp.asarray(np.stack(
        [np.frombuffer(d, np.uint8).reshape(H, pitch1) for d in datas]))

    def stage():
        return decode_stage(filt, delay=4, depth=8, channels=4,
                            width=W, bits=8)

    r = stage()
    t_st = tmin(stage, lambda r: float(np.asarray(r[0, 0, 0, 0])))
    print(f"decode_stage      {t_st*1e3:8.1f} ms  "
          f"{nbytes/t_st/1e9:6.3f} GB/s", flush=True)

    # 4. end to end
    def full():
        out, flag, adler, ovf = inf()
        filtered = out.reshape(B, H, pitch1)
        pixels = decode_stage(filtered, delay=4, depth=8, channels=4,
                              width=W, bits=8)
        return pixels, adler

    r = full()
    t_full = tmin(full, lambda r: float(np.asarray(r[1])[0])
                  + float(np.asarray(r[0][0, 0, 0, 0])))
    print(f"full              {t_full*1e3:8.1f} ms  "
          f"{nbytes/t_full/1e9:6.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
