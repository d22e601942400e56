"""Stage-level breakdown of optimal_pipeline_batch (level 9, batch 8).

Mirrors the pipeline's stages with forced-sync timing so the stage sums
match the bench's `deflate_l9_mbps` timed region.

timeout 2400 python tools/profile_encode_batch.py [B] [trials]
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

    import bench as B_
    from swift_png_tpu.lz77.deflate import Depths, search_parameters
    from swift_png_tpu.lz77.huffman import lengths_from_frequencies
    from swift_png_tpu.ops import deflate_optimal as DO
    from swift_png_tpu.ops.deflate import _emit_tables

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    H, W = 512, 512
    datas = [B_._filtered(B_._image(i, H, W)).tobytes() for i in range(B)]
    level = 9
    pitch, bpp = W * 4 + 1, 4
    stride, Ntot, TPI = DO.batch_layout([len(d) for d in datas])
    buf = np.zeros(Ntot, np.uint8)
    for i, d in enumerate(datas):
        buf[i * stride: i * stride + len(d)] = np.frombuffer(d, np.uint8)
    dbuf = jnp.asarray(buf)
    nvec = jnp.asarray(np.array([len(d) for d in datas], np.int32))

    def t(label, fn, reps=trials, sync=None):
        best = float("inf")
        r = None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            if sync is not None:
                sync(r)
            else:
                try:
                    leaf = jax.tree_util.tree_leaves(r)[0]
                    _ = float(np.asarray(leaf.reshape(-1)[:1])[0])
                except Exception:
                    pass
            best = min(best, time.perf_counter() - t0)
        print(f"{label:30s} {best*1e3:8.1f} ms", flush=True)
        return r

    # ---- host: menus + warm starts --------------------------------------
    def host_menu():
        menus, lit_fs, dist_fs = [], [], []
        for d in datas:
            m = DO.default_menu(len(d), bpp=bpp, pitch=pitch)
            extra, lit_f, dist_f = DO._sample_stats(d)
            m += [x for x in extra if x not in m]
            menus.append(tuple(sorted(m)))
            lit_fs.append(lit_f)
            dist_fs.append(dist_f)
        return menus, lit_fs, dist_fs

    menus, lit_fs, dist_fs = t("host menus+sample", host_menu, reps=2,
                               sync=lambda r: None)
    dmax = -(-max(len(m) for m in menus) // DO.DMAX_STEP) * DO.DMAX_STEP

    dv = np.zeros((B, dmax), np.int32)
    cv = np.zeros((B, dmax), np.int32)
    from swift_png_tpu.lz77 import constants as C
    for i, m in enumerate(menus):
        dv[i, :len(m)] = list(m)
        cv[i, :len(m)] = [int(C.DISTANCE_DECADE[d]) for d in m]
    dvj, cvj = jnp.asarray(dv), jnp.asarray(cv)

    cand, cblk = t("candidates kernel", lambda: DO.menu_candidates_pallas_batch(
        dvj, cvj, dbuf, nvec, dmax=dmax, stride=stride))

    Tc = B * TPI
    data2 = t("data slice (blk row)", lambda: cblk[:, dmax, :DO.NB])

    clen = np.zeros((Tc, 8, 128), np.int32)
    for i, d in enumerate(datas):
        for c in range(-(-len(d) // DO.NB)):
            clen[i * TPI + c // 128, 0, c % 128] = min(
                DO.NB, len(d) - c * DO.NB)
    clen_j = jnp.asarray(clen)

    dep_rows, run_rows, dde_rows = [], [], []
    rdinfo = dbase = None
    for i in range(B):
        depths = Depths()
        lit_f, dist_f = lit_fs[i], dist_fs[i]
        if lit_f is not None and int(lit_f.sum()) > 64:
            lit_f = lit_f.copy()
            lit_f[256] += 1
            depths.update(
                lengths_from_frequencies(lit_f, 15, force=True),
                lengths_from_frequencies(dist_f, 15, force=False))
        dep_lit, runcost, ddep, rdinfo, dbase = DO._tables_from_depths(depths)
        dep_rows.append(dep_lit)
        run_rows.append(runcost)
        dde_rows.append(ddep)
    dep_b = jnp.asarray(np.stack(dep_rows).astype(np.int32))
    run_b = jnp.asarray(np.stack(run_rows).astype(np.int32))
    dde_b = jnp.asarray(np.stack(dde_rows).astype(np.int32))
    rdinfo_r = DO._rep128(rdinfo)
    dbase_r = DO._rep128(dbase)

    def stack128(t_, rows):
        return jnp.broadcast_to(
            t_[:, :, None], (B, rows, 128)).reshape(B * rows, 128
                                                    ).astype(jnp.int32)

    iters = 2

    def dpit():
        return DO._dp_iterated(
            data2, clen_j, cand, dep_b, run_b, dde_b, rdinfo_r, dbase_r,
            k=DO.KCAND, interpret=False, tpi=TPI, iters=iters)

    terms, valid, hist_img = t(f"DP fused ({iters} iters)", dpit)

    def hist_fetch():
        return np.asarray(hist_img).astype(np.int64)

    freqs = t("hist fetch (sync)", hist_fetch, sync=lambda r: None)

    from swift_png_tpu.ops.deflate import (max_term_bits, pack_stream32,
                                           pack_stream32_short)

    def tree_build():
        trees, emit_rows, shorts = [], [], []
        for i in range(B):
            freq = freqs[i].copy()
            freq[256] += 1
            lit_l = lengths_from_frequencies(freq[:286], 15, force=True)
            dist_l = lengths_from_frequencies(freq[288:318], 15,
                                              force=False)
            trees.append((lit_l, dist_l))
            emit_rows.append(_emit_tables(lit_l, dist_l))
            shorts.append(max_term_bits(lit_l, dist_l, freqs[i]) <= 33)
        return trees, emit_rows, shorts

    trees, emit_rows, shorts = t("host tree build", tree_build,
                                 sync=lambda r: None)
    n_terms = [int(freqs[i][:288].sum()) for i in range(B)]
    grid = TPI * 128 * DO.NB
    print(f"  n_terms_max={max(n_terms)} grid={grid} shorts={shorts[:3]}")

    terms_r = terms.reshape(B, TPI, DO.NB, 128)
    valid_r = valid.reshape(B, TPI, DO.NB, 128)

    # round-4 production tail: one fused program (flatten + batched
    # one-hot emit kernel + per-image scatter packs)
    from swift_png_tpu.ops.deflate_emit import ROWS, pack_emit_table

    tabs_small = jnp.asarray(np.stack(
        [pack_emit_table(*emit_rows[i]) for i in range(B)]))
    spans = tuple(2 if s else 3 for s in shorts)

    def fused():
        return DO._emit_pack_grid(terms_r, valid_r, tabs_small,
                                  spans=spans)

    t("fused emit+pack (grid)", fused,
      sync=lambda r: float(np.asarray(r[1][-1])))


if __name__ == "__main__":
    main()
