"""Measure record-build primitive costs for the seqcopy expansion.

The sequential-copy kernel needs per-stream match-token records
(pos, dist, len) in order.  Candidate pipeline: reuse the segment
compaction (row-gather of match segments), find run starts densely,
rank via cumsum, then ONE mostly-dropped scatter into the record array.
This measures each primitive at bench-like shapes.

Usage: python tools/exp_recbuild.py [trials]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_axon")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def timeit(fn, args, trials, sync):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    sc = lambda x: float(np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])[0])

    from swift_png_tpu.ops.inflate_checkpoint import _cumsum_mxu

    # --- cumsum costs ---
    for n in (1 << 19, 1 << 20, 1 << 22):
        x = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))
        t = timeit(jax.jit(_cumsum_mxu), (x,), trials, sc)
        print(f"_cumsum_mxu {n>>10}K: {t*1e3:.2f} ms", flush=True)

    # --- mostly-dropped K-wide scatters at various index counts ---
    for n_idx, wide in ((1 << 19, 3), (1 << 19, 4), (1 << 20, 3),
                        (1 << 22, 3), (1 << 25, 3)):
        nrec = 1 << 16
        keepm = rng.random(n_idx) < (nrec * 0.9 / n_idx)
        ranks = np.cumsum(keepm) - 1
        tgt_np = np.where(keepm, ranks, nrec).astype(np.int32)
        tgt = jnp.asarray(tgt_np)
        vals = jnp.asarray(
            rng.integers(0, 1 << 20, (n_idx, wide), dtype=np.int32))

        @jax.jit
        def scat(tgt, vals):
            return jnp.zeros((nrec, vals.shape[1]), jnp.int32).at[tgt].set(
                vals, mode="drop")

        t = timeit(scat, (tgt, vals), trials, sc)
        print(f"scatter {n_idx>>10}K idx x{wide}-wide -> {nrec>>10}K: "
              f"{t*1e3:.2f} ms", flush=True)

    # --- intra-block cumsum via tri matmul on (n/64, 64) ---
    for n in (1 << 22, 1 << 25):
        x = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))

        @jax.jit
        def intrac(x, n=n):
            xb = x.reshape(n // 64, 64).astype(jnp.float32)
            tri = (jnp.arange(64)[:, None] <= jnp.arange(64)[None, :]
                   ).astype(jnp.float32)
            return jax.lax.dot_general(
                xb, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        t = timeit(intrac, (x,), trials, sc)
        print(f"intra-64 cumsum {n>>20}M: {t*1e3:.2f} ms", flush=True)

    # --- row gather at (8K..32K rows, 64 int32) ---
    for nrows, cap in ((1 << 19, 1 << 13), (1 << 19, 1 << 15)):
        tab = jnp.asarray(
            rng.integers(0, 255, (nrows, 64), dtype=np.int32))
        ids = jnp.asarray(
            rng.integers(0, nrows, cap, dtype=np.int32))

        @jax.jit
        def rg(tab, ids):
            return tab[ids]

        t = timeit(rg, (tab, ids), trials, sc)
        print(f"row gather {cap>>10}K rows of 64xi32 from {nrows>>10}K: "
              f"{t*1e3:.2f} ms", flush=True)

    # --- dense pass over 33.6M for comparison ---
    x = jnp.asarray(rng.integers(0, 255, 1 << 25, dtype=np.int32))
    t = timeit(jax.jit(lambda x: (x * 3 + 1) ^ (x >> 2)), (x,), trials, sc)
    print(f"dense pass 32M i32: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
