"""Stage breakdown of the smooth-content (match-heavy) decode path.

Smooth gradients produce deep self-referential match chains; production
routes them through the dense pointer collapse.  This measures where the
2.6 s (bench decode_smooth_gbps=0.0032) actually goes.

Usage: python tools/profile_smooth.py [B] [trials]
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
    from swift_png_tpu.ops import inflate_checkpoint as IC
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _collapse_ptr, _expand, _fill_rle,
        _adler_batch)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    H, W = 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    from bench import _filtered

    compress = lambda b: native.deflate(b, 6, "zlib", block_terms=1 << 22)
    y, x = np.mgrid[0:H, 0:W]
    datas, bodies, indexes = [], [], []
    for i in range(B):
        pix = np.stack([(x // 8 + y // 8 + i) % 256, x // 4 % 256,
                        y // 4 % 256, np.full_like(x, 255)],
                       axis=-1).astype(np.uint8)
        d = _filtered(pix).tobytes()
        datas.append(d)
        s = compress(d)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    on_tpu = jax.default_backend() not in ("cpu",)
    eng = CheckpointInflator(ob=OB, backend="pallas" if on_tpu else "xla")
    prep = eng.prepare(bodies, indexes)
    match_total = sum(int(ix.match_bytes) for ix in indexes)
    expand_cap = max(1 << 10, -(-(match_total + 64) // 8192) * 8192)
    seg_total = sum(int(ix.match_segs) for ix in indexes)
    seg_cap = max(1 << 10, -(-(seg_total + 64) // 8192) * 8192)
    Ui = prep["Ui_pad"]
    Opad = Ui * OB
    U_live = B * Ui
    S = prep["S"]
    nbytes = B * out_size
    col = CheckpointInflator.auto_collapse(match_total, B, out_size, Ui, OB)
    print(f"B={B} S={S} expand_cap={expand_cap} seg_cap={seg_cap} "
          f"match_frac={match_total/nbytes:.3f} auto_collapse={col}",
          flush=True)

    sc = lambda x: float(np.asarray(x.reshape(-1)[:1])[0])

    def tmin(fn, sync, k=trials):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    args = (prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"])

    def kern(*a):
        return decode_stamp_pallas(*a, S=S, ob=OB, interpret=not on_tpu)

    def ptr_litv(*a):
        attr4, kflag, s1k, s2k = kern(*a)
        U_pad = attr4.shape[0] * attr4.shape[1] * 128
        attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, OB)
        b = jnp.arange(OB, dtype=jnp.int32)[None, :]
        u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
        j = u * OB + b
        live = (u < U_live) & ((j % Opad) < out_size)
        ism_b = attr >= 0
        is_lit = (attr < 0) & (attr != SENTINEL)
        a32 = attr.astype(jnp.int32)
        litv = jnp.where(live & is_lit, -a32 - 1, 0).astype(jnp.uint8)
        ptr = jnp.where(live & ism_b, j - (a32 + 1), j).reshape(-1)
        return ptr, litv.reshape(-1)

    def s_collapse(*a):
        ptr, litv = ptr_litv(*a)
        ptr2, m1 = _collapse_ptr(ptr)
        return ptr2, m1, litv

    def s_expand(*a):
        ptr, litv = ptr_litv(*a)
        out, ovf, cidx, src = _expand(ptr, litv, expand_cap, seg_cap,
                                      collapse_shape=(B, Opad))
        return out

    def s_full(*a):
        ptr, litv = ptr_litv(*a)
        out, ovf, cidx, src = _expand(ptr, litv, expand_cap, seg_cap,
                                      collapse_shape=(B, Opad))
        out2 = out[:U_live * OB].reshape(B, Opad)
        return _adler_batch(out2, out_size)

    stages = [
        ("kernel", jax.jit(kern), lambda r: sc(r[1])),
        ("+ptr/litv", jax.jit(ptr_litv), lambda r: sc(r[0])),
        ("+collapse_ptr", jax.jit(s_collapse), lambda r: sc(r[0])),
        ("+expand(col)", jax.jit(s_expand), lambda r: sc(r)),
        ("+adler_batch", jax.jit(s_full), lambda r: sc(r)),
    ]
    prev = 0.0
    for name, fn, sync in stages:
        r = fn(*args)
        t = tmin(lambda: fn(*args), sync)
        print(f"{name:16s} {t*1e3:8.1f} ms  (+{(t-prev)*1e3:8.1f})  "
              f"{nbytes/t/1e9:6.3f} GB/s", flush=True)
        prev = t

    # the no-collapse alternative for reference (heavy doubling only)
    def s_nocol(*a):
        ptr, litv = ptr_litv(*a)
        out, ovf, cidx, src = _expand(ptr, litv, expand_cap, seg_cap)
        out2 = out[:U_live * OB].reshape(B, Opad)
        return _adler_batch(out2, out_size)

    fn = jax.jit(s_nocol)
    r = fn(*args)
    t = tmin(lambda: fn(*args), lambda r: sc(r))
    print(f"{'nocol+heavy':16s} {t*1e3:8.1f} ms  "
          f"{nbytes/t/1e9:6.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
