"""Sweep decode-kernel variants on the real chip (loop bound / stamp
dtype / unroll).  timeout 4000 python tools/kernel_sweep.py"""

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

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import CheckpointInflator
    from swift_png_tpu.ops.inflate_pallas import decode_stamp_pallas

    import bench as B_

    B, H, W = 8, 512, 512
    OB = int(os.environ.get("SPT_BENCH_OB", "256"))
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    bodies, indexes = [], []
    for i in range(B):
        data = B_._filtered(B_._image(i, H, W)).tobytes()
        s = native.deflate(data, 6, "zlib", block_terms=1 << 22)
        bodies.append(s[2:-4])
        indexes.append(build_index(s[2:-4], out_size, OB))

    eng = CheckpointInflator(ob=OB, backend="pallas")
    prep = eng.prepare(bodies, indexes)
    kmax = int(np.asarray(prep["kbound"]).max())
    print(f"OB={OB} S={prep['S']} kmax={kmax} T={prep['spans3'].shape[0]}",
          flush=True)

    def run(k_static, attr16, unroll):
        def kern():
            attr, flag, s1, s2 = decode_stamp_pallas(
                prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
                prep["symtab"], S=prep["S"], ob=OB, interpret=False,
                k_static=k_static, attr16=attr16, unroll=unroll)
            return flag

        f = kern()
        assert int(np.asarray(f).max()) == 0, "flagged"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = kern()
            _ = int(np.asarray(r)[0, 0])
            best = min(best, time.perf_counter() - t0)
        tag = (f"{'static' if k_static else 'dyn':6s} "
               f"{'i16' if attr16 else 'i32'} u{unroll}")
        print(f"{tag}:  {best*1e3:8.1f} ms", flush=True)

    for k_static, attr16, unroll in [
        (None, True, 1),
        (kmax, True, 1),
        (kmax, True, 4),
        (None, True, 4),
        (kmax, False, 4),
        (kmax, False, 1),
    ]:
        try:
            run(k_static, attr16, unroll)
        except Exception as e:
            print(f"variant failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def full_sweep():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, inflate_indexed_pallas)

    import bench as B_

    B, H, W = 8, 512, 512
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    datas = [B_._filtered(B_._image(i, H, W)).tobytes() for i in range(B)]
    streams = [native.deflate(d, 6, "zlib", block_terms=1 << 22)
               for d in datas]

    for OB in (256, 128):
        bodies = [s[2:-4] for s in streams]
        indexes = [build_index(b, out_size, OB) for b in bodies]
        eng = CheckpointInflator(ob=OB, backend="pallas")
        prep = eng.prepare(bodies, indexes)
        expand_cap = eng._pow2(sum(ix.match_bytes for ix in indexes) + 64,
                               1 << 10)
        for attr16 in (True, False):
            def full():
                return inflate_indexed_pallas(
                    prep["kbound"], prep["spans3"], prep["meta"],
                    prep["tabs"], prep["symtab"], ob=OB, n_streams=B,
                    out_size=out_size, expand_cap=expand_cap,
                    S=prep["S"], interpret=False, attr16=attr16)

            out, flag, adler, ovf = full()
            import zlib as _z
            assert int(np.asarray(flag).max()) == 0
            for i in range(B):
                assert int(np.asarray(adler)[i]) == _z.adler32(datas[i])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = full()
                _ = int(np.asarray(r[2])[0])
                best = min(best, time.perf_counter() - t0)
            gbps = B * out_size / best / 1e9
            print(f"OB={OB} S={prep['S']} attr16={attr16}: "
                  f"{best*1e3:8.1f} ms  {gbps:.4f} GB/s", flush=True)


def tail_sweep():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _expand, _adler_from_partials)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

    import bench as B_

    B, H, W = 8, 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    datas = [B_._filtered(B_._image(i, H, W)).tobytes() for i in range(B)]
    streams = [native.deflate(d, 6, "zlib", block_terms=1 << 22)
               for d in datas]
    bodies = [s[2:-4] for s in streams]
    indexes = [build_index(b, out_size, OB) for b in bodies]
    eng = CheckpointInflator(ob=OB, backend="pallas")
    prep = eng.prepare(bodies, indexes)
    expand_cap = eng._pow2(sum(ix.match_bytes for ix in indexes) + 64,
                           1 << 10)
    S = prep["S"]
    Ui = (out_size + OB - 1) // OB
    U_live = B * Ui
    Opad = Ui * OB

    def stages(upto):
        import functools

        @functools.partial(jax.jit, static_argnames=())
        def f(kbound, spans3, meta, tabs, symtab):
            attr4, kflag, s1k, s2k = decode_stamp_pallas(
                kbound, spans3, meta, tabs, symtab, S=S, ob=OB,
                interpret=False, attr16=False)
            if upto == 0:
                return jnp.sum(kflag)
            U_pad = attr4.shape[0] * attr4.shape[1] * 128
            attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, OB)
            if upto == 1:
                return jnp.sum(attr[::97, 0].astype(jnp.int32))
            b = jnp.arange(OB, dtype=jnp.int32)[None, :]
            u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
            j = u * OB + b
            live = (u < U_live) & ((j % Opad) < out_size)
            a32 = attr.astype(jnp.int32)
            ism_b = attr >= 0
            is_lit = (attr < 0) & (attr != SENTINEL)
            litv = jnp.where(live & is_lit, -a32 - 1, 0
                             ).reshape(-1).astype(jnp.uint8)
            ptr = jnp.where(live & ism_b, j - (a32 + 1), j).reshape(-1)
            if upto == 2:
                return jnp.sum(ptr[::97])
            out, ovf, cidx, src = _expand(ptr, litv, expand_cap)
            if upto == 3:
                return jnp.sum(out[::97].astype(jnp.int32))
            s1u = s1k.reshape(U_pad)[:U_live].reshape(B, Ui)
            s2u = s2k.reshape(U_pad)[:U_live].reshape(B, Ui)
            adler = _adler_from_partials(s1u, s2u, cidx, src, B, Ui, OB,
                                         Opad, out_size)
            return jnp.sum(adler)

        return f

    args = (prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"])
    names = ["kernel", "+relayout", "+ptr/litv", "+expand", "+adler"]
    prev = 0.0
    for upto in range(5):
        f = stages(upto)
        _ = np.asarray(f(*args))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            r = f(*args)
            _ = int(np.asarray(r))
            best = min(best, time.perf_counter() - t0)
        print(f"{names[upto]:10s}: {best*1e3:8.1f} ms  "
              f"(+{(best-prev)*1e3:6.1f})", flush=True)
        prev = best


def expand_sweep():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swift_png_tpu import native
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.ops.inflate_checkpoint import (
        CheckpointInflator, _cumsum_mxu)
    from swift_png_tpu.ops.inflate_pallas import SENTINEL, decode_stamp_pallas

    import bench as B_

    B, H, W = 8, 512, 512
    OB = 256
    pitch1 = 1 + W * 4
    out_size = H * pitch1
    datas = [B_._filtered(B_._image(i, H, W)).tobytes() for i in range(B)]
    streams = [native.deflate(d, 6, "zlib", block_terms=1 << 22)
               for d in datas]
    bodies = [s[2:-4] for s in streams]
    indexes = [build_index(b, out_size, OB) for b in bodies]
    eng = CheckpointInflator(ob=OB, backend="pallas")
    prep = eng.prepare(bodies, indexes)
    expand_cap = eng._pow2(sum(ix.match_bytes for ix in indexes) + 64,
                           1 << 10)
    S = prep["S"]
    Ui = (out_size + OB - 1) // OB
    U_live = B * Ui
    Opad = Ui * OB

    # materialize ptr/litv once on device
    @jax.jit
    def mk():
        attr4, kflag, s1k, s2k = decode_stamp_pallas(
            prep["kbound"], prep["spans3"], prep["meta"], prep["tabs"],
            prep["symtab"], S=S, ob=OB, interpret=False, attr16=False)
        U_pad = attr4.shape[0] * attr4.shape[1] * 128
        attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U_pad, OB)
        b = jnp.arange(OB, dtype=jnp.int32)[None, :]
        u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
        j = u * OB + b
        live = (u < U_live) & ((j % Opad) < out_size)
        a32 = attr.astype(jnp.int32)
        litv = jnp.where(live & (attr < 0) & (attr != SENTINEL), -a32 - 1,
                         0).reshape(-1).astype(jnp.uint8)
        ptr = jnp.where(live & (attr >= 0), j - (a32 + 1), j).reshape(-1)
        return ptr, litv

    ptr, litv = jax.block_until_ready(mk())
    N = ptr.shape[0]
    print(f"N={N} cap={expand_cap}", flush=True)

    def timed(name, f, *a):
        _ = np.asarray(jax.block_until_ready(f(*a)))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            r = f(*a)
            _ = np.asarray(r).reshape(-1)[0]
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s}: {best*1e3:8.1f} ms", flush=True)

    @jax.jit
    def f_ism(ptr):
        return jnp.sum((ptr != jnp.arange(N, dtype=jnp.int32))
                       .astype(jnp.int32)[::101])

    timed("is_m", f_ism, ptr)

    @jax.jit
    def f_cum(ptr):
        is_m = (ptr != jnp.arange(N, dtype=jnp.int32))
        return _cumsum_mxu(is_m.astype(jnp.int32))[::101]

    timed("is_m+cumsum", f_cum, ptr)

    @jax.jit
    def f_cidx(ptr):
        is_m = (ptr != jnp.arange(N, dtype=jnp.int32))
        cs = _cumsum_mxu(is_m.astype(jnp.int32))
        pos = cs - 1
        keep = is_m & (pos < expand_cap)
        cidx = jnp.full(expand_cap, N, jnp.int32).at[
            jnp.where(keep, pos, expand_cap)
        ].set(jnp.where(keep, jnp.arange(N, dtype=jnp.int32), N),
              mode="drop")
        return cidx[::33]

    timed("is_m+cumsum+scatter", f_cidx, ptr)

    @jax.jit
    def f_all(ptr, litv):
        from swift_png_tpu.ops.inflate_checkpoint import _expand
        out, ovf, cidx, src = _expand(ptr, litv, expand_cap)
        return out[::101]

    timed("full _expand", f_all, ptr, litv)


if __name__ == "__main__":
    import sys as _s
    if "--full" in _s.argv:
        full_sweep()
    elif "--tail" in _s.argv:
        tail_sweep()
    elif "--expand" in _s.argv:
        expand_sweep()
    else:
        main()
