"""Substage breakdown of the scan-fill _expand (round-4 path).

Cumulative jitted prefixes on bench content at tight caps.

Usage: python tools/profile_expand3.py [B] [trials]
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
        CheckpointInflator, _cumsum_mxu, _fill_last, _select_bit)
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
    r8k = lambda n: max(1 << 10, -(-n // 8192) * 8192)
    match_total = sum(int(ix.match_bytes) for ix in indexes)
    expand_cap = r8k(match_total + 64)
    seg_total = sum(int(ix.match_segs) for ix in indexes)
    seg_cap = r8k(seg_total + 64)
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
    j2 = u * OB + b
    live = (u < U_live) & ((j2 % Opad) < out_size)
    ism_b = attr >= 0
    is_lit = (attr < 0) & (attr != SENTINEL)
    a32 = attr.astype(jnp.int32)
    litv = jnp.asarray(np.asarray(
        jnp.where(live & is_lit, -a32 - 1, 0).astype(jnp.uint8)).reshape(-1))
    ptr = jnp.asarray(np.asarray(
        jnp.where(live & ism_b, j2 - (a32 + 1), j2)).reshape(-1))
    N = int(ptr.shape[0])
    print(f"B={B} N={N} cap={expand_cap} scap={seg_cap}", flush=True)

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

    def dense_tabs(ptr, litv):
        j = jnp.arange(N, dtype=jnp.int32)
        is_m = ptr != j
        m2 = jnp.pad(is_m.astype(jnp.uint8), (0, Np - N)).reshape(nseg, SEG)
        seg_has = jnp.sum(m2.astype(jnp.int32), axis=1) > 0
        m2k = m2 * seg_has[:, None].astype(jnp.uint8)
        mcnt = jnp.sum(m2k.astype(jnp.int32), axis=1)
        mccum = _cumsum_mxu(mcnt) - mcnt
        wsh = jnp.arange(32, dtype=jnp.uint32)[None, :]
        mask_lo = jnp.sum(m2k[:, :32].astype(jnp.uint32) << wsh, axis=1,
                          dtype=jnp.uint32)
        mask_hi = jnp.sum(m2k[:, 32:].astype(jnp.uint32) << wsh, axis=1,
                          dtype=jnp.uint32)
        total_slots = jnp.sum(mcnt)
        nkept = jnp.sum(seg_has.astype(jnp.int32))
        rank_tab = jnp.stack(
            [mccum,
             jax.lax.bitcast_convert_type(mask_lo, jnp.int32),
             jax.lax.bitcast_convert_type(mask_hi, jnp.int32)],
            axis=1).reshape(-1)
        return rank_tab, seg_has, total_slots, nkept

    def segids(ptr, litv):
        rank_tab, seg_has, total_slots, nkept = dense_tabs(ptr, litv)
        wsh = jnp.arange(32, dtype=jnp.uint32)[None, :]
        ngrp = -(-nseg // SEG)
        ghm = jnp.pad(seg_has.astype(jnp.uint32),
                      (0, ngrp * SEG - nseg)).reshape(ngrp, SEG)
        gcnt = jnp.sum(ghm.astype(jnp.int32), axis=1)
        gbase = _cumsum_mxu(gcnt) - gcnt
        glo = jnp.sum(ghm[:, :32] << wsh, axis=1, dtype=jnp.uint32)
        ghi = jnp.sum(ghm[:, 32:] << wsh, axis=1, dtype=jnp.uint32)
        gi = jnp.arange(ngrp, dtype=jnp.int32)
        gt = jnp.where(gcnt > 0, gbase, seg_cap)
        gvals = jnp.stack(
            [gi, gbase,
             jax.lax.bitcast_convert_type(glo, jnp.int32),
             jax.lax.bitcast_convert_type(ghi, jnp.int32)], axis=-1)
        grows = _fill_last(jnp.full((seg_cap, 4), -1, jnp.int32)
                           .at[gt].set(gvals, mode="drop"))
        ks = jnp.arange(seg_cap, dtype=jnp.int32)
        goff = _select_bit(
            jax.lax.bitcast_convert_type(grows[:, 2], jnp.uint32),
            jax.lax.bitcast_convert_type(grows[:, 3], jnp.uint32),
            ks - grows[:, 1])
        valid_k = ks < nkept
        seg_ids = jnp.where(valid_k, grows[:, 0] * SEG + goff, nseg)
        return seg_ids, valid_k, rank_tab, total_slots

    def slots(ptr, litv):
        seg_ids, valid_k, rank_tab, total_slots = segids(ptr, litv)
        sid_c = jnp.clip(seg_ids, 0, nseg - 1)
        g3 = rank_tab[jnp.concatenate([3 * sid_c, 3 * sid_c + 1,
                                       3 * sid_c + 2])]
        kbase = g3[:seg_cap]
        st = jnp.where(valid_k, kbase, expand_cap)
        svals = jnp.stack([seg_ids, kbase, g3[seg_cap:2 * seg_cap],
                           g3[2 * seg_cap:]], axis=-1)
        srows = _fill_last(jnp.full((expand_cap, 4), -1, jnp.int32)
                           .at[st].set(svals, mode="drop"))
        ss = jnp.arange(expand_cap, dtype=jnp.int32)
        soff = _select_bit(
            jax.lax.bitcast_convert_type(srows[:, 2], jnp.uint32),
            jax.lax.bitcast_convert_type(srows[:, 3], jnp.uint32),
            ss - srows[:, 1])
        cidx = jnp.where(ss < total_slots,
                         jnp.minimum(srows[:, 0] * SEG + soff, N), N)
        return cidx, rank_tab

    def pgather(ptr, litv):
        cidx, rank_tab = slots(ptr, litv)
        ptr_pad = jnp.concatenate(
            [ptr, jnp.arange(N, N + 1, dtype=jnp.int32)])
        p = ptr_pad[jnp.clip(cidx, 0, N)]
        return p, cidx, rank_tab

    def hop(ptr, litv):
        p_light, cidx, rank_tab = pgather(ptr, litv)
        cap_ = p_light.shape[0]
        inb = (p_light >= 0) & (p_light < N)
        pc = jnp.clip(p_light, 0, Np - 1)
        s = pc >> 6
        off = (pc & 63).astype(jnp.uint32)
        g3h = rank_tab[jnp.concatenate([3 * s, 3 * s + 1, 3 * s + 2])]
        base = g3h[:cap_]
        lo = jax.lax.bitcast_convert_type(g3h[cap_:2 * cap_], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(g3h[2 * cap_:], jnp.uint32)
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
        return c, cidx

    def chase(ptr, litv):
        c, cidx = hop(ptr, litv)

        def h_cond(stc):
            _, ch = stc
            return ch

        def h_body(stc):
            c, _ = stc
            nxt = jnp.where(c >= 0, c[jnp.clip(c, 0, expand_cap - 1)], c)
            return nxt, jnp.any(nxt != c)

        c, _ = jax.lax.while_loop(h_cond, h_body, (c, jnp.bool_(True)))
        return -c - 1, cidx

    def final(ptr, litv):
        p, cidx = chase(ptr, litv)
        src = litv[jnp.clip(p, 0, N - 1)]
        out = litv.at[cidx].set(src, mode="drop")
        return out

    stages = [
        ("dense tables", dense_tabs),
        ("+seg_ids (group fill)", segids),
        ("+slot fill+select", slots),
        ("+p gather", pgather),
        ("+rank hop", hop),
        ("+chase", chase),
        ("+src+final scatter", final),
    ]
    prev = 0.0
    for name, fn in stages:
        t = tmin(fn)
        print(f"{name:26s} {t*1e3:8.1f} ms  (+{(t-prev)*1e3:7.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
