"""On-chip breakdown: where does indexed-decode time go?

Times, with forced-sync (scalar fetch) discipline:
  - decode_stamp_pallas kernel alone
  - full inflate_indexed_pallas (kernel + tail)
  - the XLA tail pieces (relayout, cumsum/scatter/doubling, adler)
  - menu_candidates alone + DP kernel alone (level-9 encode split)

Run:  timeout 1800 python tools/profile_decode.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")


def sync(x):
    return float(np.asarray(x).reshape(-1)[0])


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        sync(r if not isinstance(r, (tuple, list)) else r[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, inflate_indexed_pallas)
    from swift_png_tpu.ops.inflate_pallas import decode_stamp_pallas

    import bench as B_

    B, H, W = 8, 512, 512
    OB = int(os.environ.get("SPT_BENCH_OB", "256"))
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    datas, bodies, indexes = [], [], []
    for i in range(B):
        data = B_._filtered(B_._image(i, H, W)).tobytes()
        datas.append(data)
        s = native.deflate(data, 6, "zlib", block_terms=1 << 22)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    eng = CheckpointInflator(ob=OB, backend="pallas")
    prep = eng.prepare(bodies, indexes)
    expand_cap = eng._pow2(sum(ix.match_bytes for ix in indexes) + 64,
                           1 << 10)
    print(f"B={B} out_size={out_size} OB={OB} S={prep['S']} "
          f"kbound_max={int(np.asarray(prep['kbound']).max())} "
          f"T={prep['spans3'].shape[0]} "
          f"match_bytes={sum(ix.match_bytes for ix in indexes)} "
          f"expand_cap={expand_cap}", flush=True)

    # --- kernel alone -----------------------------------------------------
    def kern():
        attr, flag, s1, s2 = decode_stamp_pallas(
            prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"], S=prep["S"], ob=OB, interpret=False)
        return flag

    t = timeit(kern)
    print(f"kernel alone:          {t*1e3:8.1f} ms", flush=True)

    # --- full pipeline ----------------------------------------------------
    def full():
        out, flag, adler, ovf = inflate_indexed_pallas(
            prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"], ob=OB, n_streams=B, out_size=out_size,
            expand_cap=expand_cap, S=prep["S"], interpret=False)
        return adler

    t = timeit(full)
    nbytes = B * out_size
    print(f"full inflate:          {t*1e3:8.1f} ms  "
          f"({nbytes/t/1e9:.4f} GB/s)", flush=True)
    import zlib as _z

    out, flag, adler, ovf = full_r = inflate_indexed_pallas(
        prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
        prep["symtab"], ob=OB, n_streams=B, out_size=out_size,
        expand_cap=expand_cap, S=prep["S"], interpret=False)
    assert int(np.asarray(flag).max()) == 0, "decode flagged"
    for i in range(B):
        assert int(np.asarray(adler)[i]) == _z.adler32(datas[i]), i
    assert bytes(np.asarray(out)[0]) == datas[0]
    print("correctness: OK", flush=True)

    # --- encode side ------------------------------------------------------
    from swift_png_tpu.ops.deflate_optimal import (
        menu_candidates, default_menu, _extra_menu, KCAND, NB,
        deflate_device_optimal)

    data = datas[0]
    n = len(data)
    menu = default_menu(n, bpp=4, pitch=W * 4 + 1)
    menu += [d for d in _extra_menu(data) if d not in menu]
    menu = tuple(sorted(menu))
    print(f"menu D={len(menu)} max={max(menu)} n={n}")
    chunks = -(-n // NB)
    Tc = -(-chunks // 128)
    Npad = Tc * 128 * NB
    buf = np.zeros(Npad, np.uint8)
    buf[:n] = np.frombuffer(data, np.uint8)
    dbuf = jax.block_until_ready(jnp.asarray(buf))

    def cand():
        runs, dists = menu_candidates(dbuf, jnp.int32(n), menu=menu,
                                      k=KCAND)
        return runs[0]

    t = timeit(cand)
    print(f"menu_candidates XLA:   {t*1e3:8.1f} ms  "
          f"({n/t/1e6:.2f} MB/s)", flush=True)

    from swift_png_tpu.ops.deflate_optimal import candidates_device

    t = timeit(lambda: candidates_device(data, menu, Tc, False))
    print(f"candidates pallas:     {t*1e3:8.1f} ms  "
          f"({n/t/1e6:.2f} MB/s)", flush=True)
    # correctness vs XLA
    cp = np.asarray(candidates_device(data, menu, Tc, False))
    cx = np.asarray(candidates_device(data, menu, Tc, True))
    print("candidates match:", (cp == cx).all(), flush=True)

    # DP kernel alone (one iteration)
    from swift_png_tpu.ops.deflate_optimal import (
        Depths, _tables_from_depths, _rep128, optimal_parse_device)

    data2 = jnp.transpose(
        jnp.asarray(buf.reshape(Tc, 128, NB)), (0, 2, 1)).astype(jnp.int32)
    clen = np.zeros((Tc, 8, 128), np.int32)
    for c in range(chunks):
        clen[c // 128, 0, c % 128] = min(NB, n - c * NB)
    depths = Depths()
    dep_lit, runcost, ddep, rdinfo, dbase = _tables_from_depths(depths)
    cndj = jax.block_until_ready(candidates_device(data, menu, Tc, False))

    def dp():
        terms, valid, hist = optimal_parse_device(
            data2, jnp.asarray(clen), cndj,
            _rep128(dep_lit), _rep128(runcost), _rep128(ddep),
            _rep128(rdinfo), _rep128(dbase), k=KCAND, interpret=False)
        return hist

    t = timeit(dp)
    print(f"DP kernel (1 iter):    {t*1e3:8.1f} ms  "
          f"({n/t/1e6:.2f} MB/s)", flush=True)

    t9 = timeit(lambda: np.float64(len(deflate_device_optimal(
        data, level=9, pitch=W * 4 + 1, bpp=4, interpret=False))), n=2)
    print(f"deflate_device l9 e2e: {t9*1e3:8.1f} ms  "
          f"({n/t9/1e6:.2f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
