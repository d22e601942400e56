"""Substage breakdown of the PRODUCTION _expand (rank-table heavy path).

Cumulative jitted prefixes on the bench content's ptr/litv (B=32,
non-collapse route): segment compaction, 2-wide compaction scatter, rank
tables, heavy chase, final scatter.  Marginal = consecutive differences.

Usage: python tools/profile_expand2.py [B] [trials]
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
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1

    from bench import _filtered, _image

    compress = lambda b: native.deflate(b, 6, "zlib", block_terms=1 << 22)
    bodies, indexes = [], []
    for i in range(B):
        data = _filtered(_image(i, H, W)).tobytes()
        s = compress(data)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    eng = CheckpointInflator(ob=OB)
    match_total = sum(int(ix.match_bytes) for ix in indexes)
    expand_cap = eng._pow2(match_total + 64, 1 << 10)
    seg_total = sum(int(ix.match_segs) for ix in indexes)
    seg_cap = eng._pow2(seg_total + 64, 1 << 10)
    Ui = (out_size + OB - 1) // OB
    Opad = Ui * OB

    prep = eng.prepare(bodies, indexes)
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

    N = int(ptr.shape[0])
    print(f"B={B} N={N} match={match_total} cap={expand_cap} "
          f"segs={seg_total} seg_cap={seg_cap}", flush=True)

    sc = lambda x: float(np.asarray(
        jax.tree.leaves(x)[0].reshape(-1)[:1])[0])

    def tmin(fn, k=trials):
        f = jax.jit(fn)
        r = f(ptr, litv)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            r = f(ptr, litv)
            sc(r)
            best = min(best, time.perf_counter() - t0)
        return best

    Np = -(-N // SEG) * SEG
    nseg = Np // SEG

    def seg_stage(ptr, litv):
        is_m = (ptr != jnp.arange(N, dtype=jnp.int32))
        segm = jnp.pad(is_m.astype(jnp.uint8), (0, Np - N)).reshape(
            nseg, SEG)
        seg_has = jnp.sum(segm.astype(jnp.int32), axis=1) > 0
        cs = _cumsum_mxu(seg_has.astype(jnp.int32))
        spos = cs - 1
        keep = seg_has & (spos < seg_cap)
        seg_ids = jnp.full(seg_cap, nseg, jnp.int32).at[
            jnp.where(keep, spos, seg_cap)
        ].set(jnp.where(keep, jnp.arange(nseg, dtype=jnp.int32), nseg),
              mode="drop")
        return seg_ids, keep, is_m

    def compact_stage(ptr, litv):
        seg_ids, keep, is_m = seg_stage(ptr, litv)
        ptr2d = jnp.pad(ptr, (0, Np - N + SEG), constant_values=0)
        ptr2d = (ptr2d.at[N:].set(
            jnp.arange(N, Np + SEG, dtype=jnp.int32)).reshape(
            nseg + 1, SEG))
        gptr = ptr2d[seg_ids]
        gidx = (seg_ids[:, None] * SEG
                + jnp.arange(SEG, dtype=jnp.int32)[None, :])
        flat_m = (gptr != gidx).reshape(-1)
        gidx = gidx.reshape(-1)
        gp = gptr.reshape(-1)
        cs2 = _cumsum_mxu(flat_m.astype(jnp.int32))
        pos2 = cs2 - 1
        keep2 = flat_m & (pos2 < expand_cap)
        tgt = jnp.where(keep2, pos2, expand_cap)
        both = jnp.full((expand_cap, 2), N, jnp.int32).at[tgt].set(
            jnp.stack([jnp.where(keep2, gidx, N),
                       jnp.where(keep2, gp, N)], axis=-1), mode="drop")
        return both[:, 0], both[:, 1], keep, is_m

    def rank_stage(ptr, litv):
        cidx, p, keep, is_m = compact_stage(ptr, litv)
        full_m2 = jnp.pad((ptr != jnp.arange(N, dtype=jnp.int32)).astype(
            jnp.uint8), (0, Np - N)).reshape(nseg, SEG)
        full_m2 = full_m2 * keep[:, None].astype(jnp.uint8)
        mcnt = jnp.sum(full_m2.astype(jnp.int32), axis=1)
        mccum = _cumsum_mxu(mcnt) - mcnt
        wsh = jnp.arange(32, dtype=jnp.uint32)[None, :]
        mask_lo = jnp.sum(full_m2[:, :32].astype(jnp.uint32) << wsh, axis=1,
                          dtype=jnp.uint32)
        mask_hi = jnp.sum(full_m2[:, 32:].astype(jnp.uint32) << wsh, axis=1,
                          dtype=jnp.uint32)
        rank_tab = jnp.stack(
            [mccum,
             jax.lax.bitcast_convert_type(mask_lo, jnp.int32),
             jax.lax.bitcast_convert_type(mask_hi, jnp.int32)],
            axis=1).reshape(-1)
        return rank_tab, cidx, p

    def chase_stage(ptr, litv):
        rank_tab, cidx, p_light = rank_stage(ptr, litv)
        cap_ = p_light.shape[0]
        inb = (p_light >= 0) & (p_light < N)
        pc = jnp.clip(p_light, 0, Np - 1)
        s = pc >> 6
        off = (pc & 63).astype(jnp.uint32)
        g3 = rank_tab[jnp.concatenate([3 * s, 3 * s + 1, 3 * s + 2])]
        base = g3[:cap_]
        lo = jax.lax.bitcast_convert_type(g3[cap_:2 * cap_], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(g3[2 * cap_:], jnp.uint32)
        offl = jnp.minimum(off, jnp.uint32(31))
        offh = jnp.minimum(off - 32, jnp.uint32(31))
        ml = jnp.where(off < 32, (jnp.uint32(1) << offl) - 1,
                       jnp.uint32(0xFFFFFFFF))
        mh = jnp.where(off < 32, jnp.uint32(0),
                       (jnp.uint32(1) << offh) - 1)
        cnt = (jax.lax.population_count(lo & ml)
               + jax.lax.population_count(hi & mh)).astype(jnp.int32)
        bit = jnp.where(off < 32, (lo >> offl) & 1, (hi >> offh) & 1)
        slot = base + cnt
        is_slot = inb & (bit == 1) & (slot < expand_cap)
        c = jnp.where(is_slot, slot, -p_light - 1)

        def h_cond(st):
            _, ch = st
            return ch

        def h_body(st):
            c, _ = st
            nxt = jnp.where(c >= 0, c[jnp.clip(c, 0, expand_cap - 1)], c)
            return nxt, jnp.any(nxt != c)

        c, _ = jax.lax.while_loop(h_cond, h_body, (c, jnp.bool_(True)))
        return -c - 1, cidx

    def out_stage(ptr, litv):
        p, cidx = chase_stage(ptr, litv)
        src = litv[jnp.clip(p, 0, N - 1)]
        out = litv.at[cidx].set(src, mode="drop")
        return out

    stages = [
        ("segments (cumsum+scatter)", seg_stage),
        ("+rowgather+cumsum+2w-scat", compact_stage),
        ("+rank tables", rank_stage),
        ("+hop+chase", chase_stage),
        ("+src gather+final scatter", out_stage),
    ]
    prev = 0.0
    for name, fn in stages:
        t = tmin(fn)
        print(f"{name:28s} {t*1e3:8.1f} ms  (+{(t-prev)*1e3:7.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
