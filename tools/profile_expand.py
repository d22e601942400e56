"""Sub-stage breakdown of the back-reference expansion (_expand).

Cumulative jitted prefixes over the bench content's ptr/litv arrays:
compaction layers, inv build, doubling rounds, final scatter.

Usage: python tools/profile_expand.py [B] [trials]
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
    from swift_png_tpu.lz77.index import MATCH_SEG as SEG
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _cumsum_mxu)

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

    eng = CheckpointInflator(ob=OB)
    match_total = sum(int(ix.match_bytes) for ix in indexes)
    expand_cap = max(1 << 10, -(-(match_total + 64) // 8192) * 8192)
    seg_total = sum(int(ix.match_segs) for ix in indexes)
    seg_cap = max(1 << 10, -(-(seg_total + 64) // 8192) * 8192)
    Ui = (out_size + OB - 1) // OB
    Opad = Ui * OB

    # build ptr/litv via the device prep + kernel once (untimed), then
    # time _expand's stages on those fixed arrays
    prep = eng.prepare(bodies, indexes)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

    attr4, kflag, s1k, s2k = decode_stamp_pallas(
        prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
        prep["symtab"], S=prep["S"], ob=OB)
    U_pad = attr4.shape[0] * attr4.shape[1] * 128
    U_live = B * Ui
    attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, OB)
    b = jnp.arange(OB, dtype=jnp.int32)[None, :]
    u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
    j = u * OB + b
    live = (u < U_live) & ((j % Opad) < out_size)
    ism_b = attr >= 0
    is_lit = (attr < 0) & (attr != SENTINEL)
    a32 = attr.astype(jnp.int32)
    litv = jnp.asarray(np.asarray(
        jnp.where(live & is_lit, -a32 - 1, 0).astype(jnp.uint8)).reshape(-1))
    ptr = jnp.asarray(np.asarray(
        jnp.where(live & ism_b, j - (a32 + 1), j)).reshape(-1))

    N = ptr.shape[0]
    nbytes = B * out_size
    print(f"B={B} N={N} expand_cap={expand_cap} seg_cap={seg_cap}",
          flush=True)

    sc = lambda x: float(np.asarray(x.reshape(-1)[:1])[0])

    def tmin(fn, sync, k=trials):
        r = fn(ptr, litv)
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = fn(ptr, litv)
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best, r

    Np = -(-N // SEG) * SEG
    nseg = Np // SEG

    def st_segids(ptr, litv):
        is_m = (ptr != jnp.arange(N, dtype=jnp.int32))
        segm = jnp.pad(is_m.astype(jnp.uint8), (0, Np - N)).reshape(nseg,
                                                                    SEG)
        seg_has = jnp.sum(segm.astype(jnp.int32), axis=1) > 0
        cs = _cumsum_mxu(seg_has.astype(jnp.int32))
        spos = cs - 1
        keep = seg_has & (spos < seg_cap)
        seg_ids = jnp.full(seg_cap, nseg, jnp.int32).at[
            jnp.where(keep, spos, seg_cap)
        ].set(jnp.where(keep, jnp.arange(nseg, dtype=jnp.int32), nseg),
              mode="drop")
        return seg_ids, segm

    def st_cidx(ptr, litv):
        seg_ids, segm = st_segids(ptr, litv)
        segm_p = jnp.concatenate([segm, jnp.zeros((1, SEG), jnp.uint8)])
        gism = segm_p[seg_ids]
        gidx = (seg_ids[:, None] * SEG
                + jnp.arange(SEG, dtype=jnp.int32)[None, :])
        flat_m = gism.reshape(-1) != 0
        gidx = gidx.reshape(-1)
        cs2 = _cumsum_mxu(flat_m.astype(jnp.int32))
        pos2 = cs2 - 1
        keep2 = flat_m & (pos2 < expand_cap)
        cidx = jnp.full(expand_cap, N, jnp.int32).at[
            jnp.where(keep2, pos2, expand_cap)
        ].set(jnp.where(keep2, gidx, N), mode="drop")
        return cidx

    def st_inv(ptr, litv):
        cidx = st_cidx(ptr, litv)
        ptr_pad = jnp.concatenate(
            [ptr, jnp.arange(N, N + 1, dtype=jnp.int32)])
        p = ptr_pad[jnp.clip(cidx, 0, N)]
        inv = jnp.full(N + 1, -1, jnp.int32).at[
            jnp.clip(cidx, 0, N)].set(
            jnp.arange(expand_cap, dtype=jnp.int32), mode="drop")
        ti = inv[jnp.clip(p, 0, N)]
        c = jnp.where(ti >= 0, ti, -p - 1)
        return c, cidx

    def st_chase(ptr, litv):
        c, cidx = st_inv(ptr, litv)

        def h_cond(st):
            _, ch = st
            return ch

        def h_body(st):
            c, _ = st
            nxt = jnp.where(c >= 0, c[jnp.clip(c, 0, expand_cap - 1)], c)
            return nxt, jnp.any(nxt != c)

        c, _ = jax.lax.while_loop(h_cond, h_body, (c, jnp.bool_(True)))
        return -c - 1, cidx

    def st_out(ptr, litv):
        p, cidx = st_chase(ptr, litv)
        src = litv[jnp.clip(p, 0, N - 1)]
        out = litv.at[cidx].set(src, mode="drop")
        return out

    stages = [
        ("seg_ids (cumsum+scatter)", jax.jit(st_segids),
         lambda r: sc(r[0])),
        ("+cidx (rowgather+cumsum)", jax.jit(st_cidx), lambda r: sc(r)),
        ("+inv+first-hop", jax.jit(st_inv), lambda r: sc(r[0])),
        ("+doubling chase", jax.jit(st_chase), lambda r: sc(r[0])),
        ("+src gather+scatter", jax.jit(st_out), lambda r: sc(r)),
    ]
    prev = 0.0
    for name, fn, sync in stages:
        t, _ = tmin(fn, sync)
        print(f"{name:26s} {t*1e3:8.1f} ms  (+{(t-prev)*1e3:7.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
