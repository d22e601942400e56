"""Sub-stage breakdown of the inflate XLA tail (post-kernel).

Times cumulative jitted prefixes of inflate_indexed_pallas's tail so the
fusion behavior matches production: kernel → +relayout → +ptr/litv →
+expand → +adler.  Differences between consecutive lines are the marginal
stage costs.

Usage: python tools/profile_tail.py [B] [trials]
"""

from __future__ import annotations

import functools
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
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _adler_from_partials, _expand, F_BAD)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

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
    S = prep["S"]
    ob = OB
    Ui = prep["Ui_pad"]
    Opad = Ui * ob
    U_live = B * Ui
    nbytes = B * out_size
    print(f"B={B} S={S} expand_cap={expand_cap} seg_cap={seg_cap}",
          flush=True)

    def tmin(fn, sync, k=trials):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    def stage_kernel(kbound, spans3, meta, tabs, symtab):
        return decode_stamp_pallas(kbound, spans3, meta, tabs, symtab,
                                   S=S, ob=ob, interpret=not on_tpu)

    def stage_relayout(kbound, spans3, meta, tabs, symtab):
        attr4, kflag, s1k, s2k = stage_kernel(kbound, spans3, meta, tabs,
                                              symtab)
        U_pad = attr4.shape[0] * attr4.shape[1] * 128
        attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, ob)
        return attr, kflag, s1k, s2k

    def stage_ptr(kbound, spans3, meta, tabs, symtab):
        attr, kflag, s1k, s2k = stage_relayout(kbound, spans3, meta, tabs,
                                               symtab)
        U_pad = attr.shape[0]
        b = jnp.arange(ob, dtype=jnp.int32)[None, :]
        u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
        j = u * ob + b
        live = (u < U_live) & ((j % Opad) < out_size)
        ism_b = attr >= 0
        is_lit = (attr < 0) & (attr != SENTINEL)
        a32 = attr.astype(jnp.int32)
        litv = jnp.where(live & is_lit, -a32 - 1, 0).astype(jnp.uint8)
        ptr = jnp.where(live & ism_b, j - (a32 + 1), j).reshape(-1)
        return ptr, litv.reshape(-1), kflag, s1k, s2k

    def stage_expand(kbound, spans3, meta, tabs, symtab):
        ptr, litv, kflag, s1k, s2k = stage_ptr(kbound, spans3, meta, tabs,
                                               symtab)
        out, ovf, cidx, src = _expand(ptr, litv, expand_cap, seg_cap)
        return out, cidx, src, s1k, s2k

    def stage_adler(kbound, spans3, meta, tabs, symtab):
        out, cidx, src, s1k, s2k = stage_expand(kbound, spans3, meta, tabs,
                                                symtab)
        U_pad = s1k.shape[0] * s1k.shape[1] * s1k.shape[2] \
            if s1k.ndim == 3 else s1k.size
        s1u = s1k.reshape(-1)[:U_live].reshape(B, Ui)
        s2u = s2k.reshape(-1)[:U_live].reshape(B, Ui)
        adler = _adler_from_partials(s1u, s2u, cidx, src, B, Ui, ob, Opad,
                                     out_size)
        out2 = out[:U_live * ob].reshape(B, Opad)
        return out2[:, :out_size], adler

    args = (prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"])
    # sync by slicing a scalar ON DEVICE first — np.asarray on a large
    # output would pull the whole buffer through the ~10-100 MB/s tunnel
    # and time the transfer, not the compute
    sc = lambda x: float(np.asarray(x.reshape(-1)[:1])[0])
    stages = [
        ("kernel", jax.jit(stage_kernel), lambda r: sc(r[1])),
        ("+relayout", jax.jit(stage_relayout), lambda r: sc(r[0])),
        ("+ptr/litv", jax.jit(stage_ptr), lambda r: sc(r[0])),
        ("+expand", jax.jit(stage_expand), lambda r: sc(r[0])),
        ("+adler (full tail)", jax.jit(stage_adler), lambda r: sc(r[1])),
    ]
    prev = 0.0
    for name, fn, sync in stages:
        r = fn(*args)  # compile
        t = tmin(lambda: fn(*args), sync)
        print(f"{name:22s} {t*1e3:8.1f} ms  (+{(t-prev)*1e3:7.1f})  "
              f"{nbytes/t/1e9:6.3f} GB/s", flush=True)
        prev = t


if __name__ == "__main__":
    main()
