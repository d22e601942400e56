"""Stage breakdown of the smooth-content (records-mode) decode.

Cumulative prefixes on the bench's smooth gradient content at Bs=8:
decode kernel → +ptr/litv relayout → +record build → +seqcopy kernel →
+adler.  Usage: python tools/profile_smooth2.py [Bs] [trials]
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
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _adler_batch)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas
    from swift_png_tpu.ops.inflate_seqcopy import (build_records,
                                                   seqcopy_expand)

    Bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    from bench import _filtered

    compress = lambda b: native.deflate(b, 6, "zlib", block_terms=1 << 22)
    y, x = np.mgrid[0:H, 0:W]
    bodies, indexes = [], []
    for i in range(Bs):
        pix = np.stack([(x // 8 + y // 8 + i) % 256, x // 4 % 256,
                        y // 4 % 256, np.full_like(x, 255)],
                       axis=-1).astype(np.uint8)
        d = _filtered(pix).tobytes()
        s = compress(d)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    eng = CheckpointInflator(ob=OB)
    prep = eng.prepare(bodies, indexes)
    smatch = sum(int(ix.match_bytes) for ix in indexes)
    Ui = (out_size + OB - 1) // OB
    Opad = Ui * OB
    rec_cap = 1 << 15
    print(f"Bs={Bs} match={smatch} frac={smatch/(Bs*out_size):.3f} "
          f"rec_cap={rec_cap}", flush=True)

    sc = lambda x: float(np.asarray(
        jax.tree.leaves(x)[0].reshape(-1)[:1])[0])

    def tmin(fn, args, k=trials):
        r = fn(*args)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn(*args)
            sc(r)
            best = min(best, time.perf_counter() - t0)
        return best, r

    kargs = (prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
             prep["symtab"])

    @jax.jit
    def st_kernel(kb, sp, me, ta, sy):
        return decode_stamp_pallas(kb, sp, me, ta, sy, S=prep["S"], ob=OB)

    @jax.jit
    def st_ptr(kb, sp, me, ta, sy):
        attr4, kflag, s1k, s2k = decode_stamp_pallas(
            kb, sp, me, ta, sy, S=prep["S"], ob=OB)
        U_pad = attr4.shape[0] * attr4.shape[1] * 128
        U_live = Bs * Ui
        attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, OB)
        b = jnp.arange(OB, dtype=jnp.int32)[None, :]
        u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
        j = u * OB + b
        live = (u < U_live) & ((j % Opad) < out_size)
        ism_b = attr >= 0
        is_lit = (attr < 0) & (attr != SENTINEL)
        a32 = attr.astype(jnp.int32)
        litv = jnp.where(live & is_lit, -a32 - 1, 0).astype(
            jnp.uint8).reshape(-1)
        ptr = jnp.where(live & ism_b, j - (a32 + 1), j).reshape(-1)
        return ptr, litv

    @jax.jit
    def st_recs(kb, sp, me, ta, sy):
        ptr, litv = st_ptr(kb, sp, me, ta, sy)
        starts, recs, rovf = build_records(ptr, Bs, Opad, rec_cap)
        return starts, recs, rovf, litv

    @jax.jit
    def st_seq(kb, sp, me, ta, sy):
        starts, recs, rovf, litv = st_recs(kb, sp, me, ta, sy)
        out = seqcopy_expand(starts, recs, litv[:Bs * Opad], B=Bs,
                             Opad=Opad)
        return out

    @jax.jit
    def st_adler(kb, sp, me, ta, sy):
        out = st_seq(kb, sp, me, ta, sy)
        return out, _adler_batch(out.reshape(Bs, Opad), out_size)

    stages = [("kernel", st_kernel), ("+ptr/litv", st_ptr),
              ("+records", st_recs), ("+seqcopy", st_seq),
              ("+adler", st_adler)]
    prev = 0.0
    for name, fn in stages:
        t, r = tmin(fn, kargs)
        print(f"{name:12s} {t*1e3:8.1f} ms  (+{(t-prev)*1e3:7.1f})",
              flush=True)
        prev = t
    starts, recs, rovf, _ = st_recs(*kargs)
    print("nrec:", int(np.asarray(starts)[-1]), "ovf:", bool(rovf))


if __name__ == "__main__":
    main()
