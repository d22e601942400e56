"""Micro-benchmarks for the pack path's primitive costs on this chip.

Chained-call timing (K calls, one sync) to strip the ~30 ms tunnel tax.
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
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swift_png_tpu.ops.inflate_checkpoint import _cumsum_mxu

    N = 1 << 20
    rng = np.random.default_rng(0)
    nb = jnp.asarray(rng.integers(8, 14, N).astype(np.int32))
    lanes = jnp.asarray(rng.integers(0, 65535, (4, N)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 3 * N, N).astype(np.int32))

    def chain(label, fn, x0, K=10):
        # warmup
        x = fn(x0)
        _ = float(np.asarray(x.reshape(-1)[:1])[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x = x0
            for _ in range(K):
                x = fn(x)
            _ = float(np.asarray(x.reshape(-1)[:1])[0])
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{label:34s} {best*1e3:8.2f} ms", flush=True)

    cumsum_j = jax.jit(lambda x: jnp.cumsum(x) & 0x7FFFFF)
    chain("jnp.cumsum 1M i32", cumsum_j, nb)

    mxu_j = jax.jit(lambda x: _cumsum_mxu(x) & 0x7FFFFF)
    chain("_cumsum_mxu 1M i32", mxu_j, nb)

    # scatter-add with out-of-bounds dropped vs real-sink
    atoms0 = jnp.zeros(3 * N + 8, jnp.int32)

    @jax.jit
    def scat_drop(a):
        out = jnp.zeros(3 * N + 8, jnp.int32)
        for k in range(4):
            live = (idx + k) % 4 == 0  # ~25% live
            out = out.at[jnp.where(live, idx, 3 * N + 8)].add(
                jnp.where(live, lanes[k], 0), mode="drop")
        return out + a[:1]

    chain("4x1M scatter-add 25% live drop", scat_drop, atoms0)

    @jax.jit
    def scat_sink(a):
        out = jnp.zeros(3 * N + 8, jnp.int32)
        for k in range(4):
            live = (idx + k) % 4 == 0
            out = out.at[jnp.where(live, idx, 3 * N + 7)].add(
                jnp.where(live, lanes[k], 0))
        return out + a[:1]

    chain("4x1M scatter-add 25% live sink", scat_sink, atoms0)

    @jax.jit
    def scat_all(a):
        out = jnp.zeros(3 * N + 8, jnp.int32)
        for k in range(4):
            out = out.at[idx].add(lanes[k])
        return out + a[:1]

    chain("4x1M scatter-add all live", scat_all, atoms0)

    tab = jnp.asarray(rng.integers(0, 1 << 20, 320).astype(np.int32))
    sym = jnp.asarray(rng.integers(0, 288, N).astype(np.int32))

    @jax.jit
    def gath(a):
        return tab[sym] ^ a

    chain("1M gather into 288-table", gath, sym * 0)

    # full pack pair for reference
    from swift_png_tpu.ops.deflate import pack_stream, pack_bits, pack_terms

    terms = jnp.asarray(
        (0xF8000000 | rng.integers(0, 256, N)).astype(np.uint32))
    vm = jnp.ones(N, bool)
    lit_bits = jnp.asarray(rng.integers(0, 512, 288).astype(np.int32))
    lit_len = jnp.asarray(rng.integers(8, 10, 288).astype(np.int32))
    dist_bits = jnp.asarray(rng.integers(0, 32, 30).astype(np.int32))
    dist_len = jnp.asarray(rng.integers(4, 6, 30).astype(np.int32))

    def ps(x):
        a, t = pack_stream(terms, vm, lit_bits, lit_len, dist_bits,
                           dist_len)
        return a + x[:1]

    chain("pack_stream 1M literals", jax.jit(ps), atoms0)

    def pt(x):
        lanes2, nb2 = pack_terms(terms, lit_bits, lit_len, dist_bits,
                                 dist_len)
        return lanes2[0] + x[:1]

    chain("pack_terms 1M", jax.jit(pt), jnp.zeros(N, jnp.int32))


def main2():
    """Round-4 A/Bs: quad packer, fused emit-table gather, cumsum sizes."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swift_png_tpu.ops.deflate import (pack_bits32, pack_bits32_quad,
                                           pack_terms32)

    N = 1 << 20
    rng = np.random.default_rng(0)
    # literal-heavy term mix: 11% matches (the bench's filtered content)
    is_m = rng.random(N) < 0.11
    terms = np.where(
        is_m,
        (np.uint32(5) << 27) | (np.uint32(7) << 14) | (np.uint32(2) << 9)
        | 0x100 | 3,
        0xF8000000 | rng.integers(0, 256, N).astype(np.uint32))
    terms_j = jnp.asarray(terms.astype(np.uint32))
    vm = jnp.ones(N, bool)
    lit_bits = jnp.asarray(rng.integers(0, 512, 288).astype(np.int32))
    lit_len = jnp.asarray(rng.integers(8, 13, 288).astype(np.int32))
    dist_bits = jnp.asarray(rng.integers(0, 32, 30).astype(np.int32))
    dist_len = jnp.asarray(rng.integers(4, 6, 30).astype(np.int32))

    def chain(label, fn, x0, K=10):
        x = fn(x0)
        _ = float(np.asarray(x.reshape(-1)[:1])[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x = x0
            for _ in range(K):
                x = fn(x)
            _ = float(np.asarray(x.reshape(-1)[:1])[0])
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{label:40s} {best*1e3:8.2f} ms", flush=True)

    lo, hi, nb = pack_terms32(terms_j, lit_bits, lit_len, dist_bits,
                              dist_len)
    lo, hi, nb = map(jnp.asarray, (np.asarray(lo), np.asarray(hi),
                                   np.asarray(nb)))
    z = jnp.zeros(N, jnp.int32)

    @jax.jit
    def pb32(x):
        a, t = pack_bits32(lo + x[:1] * 0, hi, nb, vm, spans=2)
        return a

    chain("pack_bits32 spans=2 1M", pb32, z)

    @jax.jit
    def pbq(x):
        a, t = pack_bits32_quad(lo + x[:1] * 0, hi, nb, vm, spans=2)
        return a

    chain("pack_bits32_quad 1M", pbq, z)

    @jax.jit
    def pt32(x):
        l2, h2, n2 = pack_terms32(terms_j, lit_bits + x[:1] * 0, lit_len,
                                  dist_bits, dist_len)
        return l2 + h2 + n2

    chain("pack_terms32 1M (2 gathers)", pt32, z)

    # fused emit table: one gather of (sym*32+dd) rows into (9216, 2)
    fused = jnp.stack(
        [jnp.tile((lit_bits | (lit_len << 16))[:, None], (1, 32)),
         jnp.tile((dist_bits | (dist_len << 16))[None, :30], (288, 1))
         [:, list(range(30)) + [0, 0]]],
        axis=-1).reshape(9216, 2)
    tu = terms_j.astype(jnp.uint32)
    is_lit = ((tu >> 27) == 31) & ((tu & 0x100) == 0)
    sym = jnp.where(is_lit, (tu & 0xFF).astype(jnp.int32),
                    257 + jnp.clip((tu & 0xFF).astype(jnp.int32), 0, 28))
    dd = jnp.where(is_lit, 0, jnp.clip((tu >> 27).astype(jnp.int32), 0, 29))

    @jax.jit
    def fg(x):
        g = fused[sym * 32 + dd + x[:1] * 0]
        return g[:, 0] + g[:, 1]

    chain("fused (9216,2) row gather 1M", fg, z)

    @jax.jit
    def fg_flat(x):
        ft = fused.reshape(-1)
        i2 = (sym * 32 + dd) * 2 + x[:1] * 0
        g = ft[jnp.concatenate([i2, i2 + 1])]
        return g[:N] + g[N:]

    chain("fused flat 1-gather 2M idx", fg_flat, z)

    for sz in (18, 20):
        v = jnp.asarray(rng.integers(1, 48, 1 << sz).astype(np.int32))

        @jax.jit
        def cs(x, v=v):
            return jnp.cumsum(v + x[:1] * 0) & 0xFFFFF

        chain(f"jnp.cumsum {1 << sz} i32", cs, jnp.zeros(1 << sz, jnp.int32))


if __name__ == "__main__":
    main2() if len(sys.argv) > 1 and sys.argv[1] == "2" else main()
