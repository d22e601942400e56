"""Feasibility experiment: sequential-copy Pallas expansion kernel.

The round-3 expansion resolves LZ77 back-references with compacted
pointer doubling — ~7 random-access ops at a ~5 ms floor each (~40 ms of
the 64 ms decode at B=32).  This experiment tests the redesign: match
tokens as (pos, dist, len) records executed IN ORDER per stream inside a
Pallas kernel, each step a dense 128-lane row op (2 dynamic-row reads,
dynamic lane rotate, masked RMW store).  Sequential semantics = the
reference's byte-by-byte forward copy (LZ77.InflatorOut.swift:124-139),
so there are no chains and no chase at all.

Usage:
  python tools/exp_seqcopy.py correctness
  python tools/exp_seqcopy.py bench [B] [recs_per_stream] [trials]
  python tools/exp_seqcopy.py smem   # scalar-prefetch size probe
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, recs_ref, lit_ref, out_ref):
    b = pl.program_id(0)
    out_ref[:] = lit_ref[:]
    rs = starts_ref[b]
    re = starts_ref[b + 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def token(t, _):
        pos = recs_ref[3 * t]
        d = recs_ref[3 * t + 1]
        ln = recs_ref[3 * t + 2]

        def cond(st):
            c, _ = st
            return c < ln

        def body(st):
            c, D = st
            tgt = pos + c
            l0 = tgt & 127
            n = jnp.minimum(jnp.minimum(D, ln - c), 128 - l0)
            q = tgt - D - l0
            # 8 leading pad rows: q >= -127 (src >= 0), so ra >= 7 and
            # the negative-q garbage row is loaded but never selected
            ra = (q >> 7) + 8
            r = q & 127
            # dynamic sublane access must be 8-aligned: read an aligned
            # 16-row window and sublane-rotate the two source rows to
            # the front
            base = pl.multiple_of((ra >> 3) << 3, 8)
            win = out_ref[pl.ds(base, 16), :]
            # dynamic rotates are unsupported for i8: log-decomposed
            # static rolls gated on the shift bits
            s = ra - base
            for k in (1, 2, 4):
                win = jnp.where(
                    (s & k) != 0,
                    jnp.concatenate([win[k:], win[:k]], axis=0), win)
            rot = win[0:2]
            for k in (1, 2, 4, 8, 16, 32, 64):
                rot = jnp.where(
                    (r & k) != 0,
                    jnp.concatenate([rot[:, k:], rot[:, :k]], axis=1), rot)
            comb = jnp.where(iota < 128 - r, rot[0:1], rot[1:2])
            trow = (tgt >> 7) + 8
            tbase = pl.multiple_of((trow >> 3) << 3, 8)
            m = ((iota8 == trow - tbase) & (iota >= l0)
                 & (iota < l0 + n))
            cur = out_ref[pl.ds(tbase, 8), :]
            out_ref[pl.ds(tbase, 8), :] = jnp.where(
                m, jnp.broadcast_to(comb, (8, 128)), cur)
            return c + n, jnp.where(n == D, 2 * D, D)

        jax.lax.while_loop(cond, body, (jnp.int32(0), d))
        return 0

    jax.lax.fori_loop(rs, re, token, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def seqcopy(starts, recs, lit, *, interpret=False):
    B, Rp, _ = lit.shape
    Rpp = Rp + 8
    lit = jnp.concatenate(
        [jnp.zeros((B, 8, 128), jnp.uint8), lit], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Rpp, 128), lambda b, s, r: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Rpp, 128), lambda b, s, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kern(starts_ref, recs_ref, lit_ref, out_ref):
        _kernel(starts_ref, recs_ref, lit_ref.at[0], out_ref.at[0])

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Rpp, 128), jnp.uint8),
        interpret=interpret,
    )(starts, recs.reshape(-1), lit)[:, 8:]


def _ref_expand(lit_flat, recs, starts, B, Rp):
    out = lit_flat.copy().reshape(B, Rp * 128)
    for b in range(B):
        for t in range(starts[b], starts[b + 1]):
            pos, d, ln = recs[t]
            for i in range(ln):
                out[b, pos + i] = out[b, pos + i - d]
    return out


def _make_case(B, n_recs, Rp, rng, smooth=False):
    lit = rng.integers(0, 256, (B, Rp * 128), dtype=np.uint8)
    recs = []
    starts = [0]
    for b in range(B):
        pos = 300
        for _ in range(n_recs):
            if smooth:
                d = int(rng.choice([1, 2, 4, 8]))
                ln = int(rng.integers(64, 258))
            else:
                d = int(rng.integers(1, min(pos, 32768)))
                ln = int(rng.integers(3, 259))
            if pos + ln >= (Rp - 17) * 128:
                break
            recs.append((pos, d, ln))
            pos += ln + int(rng.integers(1, 40))
        starts.append(len(recs))
    recs = np.asarray(recs, np.int32).reshape(-1, 3)
    return lit, recs, np.asarray(starts, np.int32)


def correctness():
    rng = np.random.default_rng(0)
    B, Rp = 3, 64
    lit, recs, starts = _make_case(B, 60, Rp, rng)
    want = _ref_expand(lit, recs, starts, B, Rp)
    interp = jax.default_backend() == "cpu"
    got = np.asarray(seqcopy(jnp.asarray(starts), jnp.asarray(recs),
                             jnp.asarray(lit.reshape(B, Rp, 128)),
                             interpret=interp)).reshape(B, Rp * 128)
    ok = np.array_equal(got, want)
    print("random-d case:", "OK" if ok else "MISMATCH")
    if not ok:
        bad = np.nonzero(got != want)
        print("first mismatches:", bad[0][:5], bad[1][:5])
        return
    lit, recs, starts = _make_case(B, 60, Rp, rng, smooth=True)
    want = _ref_expand(lit, recs, starts, B, Rp)
    got = np.asarray(seqcopy(jnp.asarray(starts), jnp.asarray(recs),
                             jnp.asarray(lit.reshape(B, Rp, 128)),
                             interpret=interp)).reshape(B, Rp * 128)
    ok = np.array_equal(got, want)
    print("smooth (self-overlap) case:", "OK" if ok else "MISMATCH")


def bench():
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    npr = int(sys.argv[3]) if len(sys.argv) > 3 else 1100
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    rng = np.random.default_rng(1)
    Rp = 8208  # ~1 MB stream + pad
    for name, smooth in (("photo-ish", False), ("smooth", True)):
        lit, recs, starts = _make_case(B, npr, Rp, rng, smooth=smooth)
        nrec = recs.shape[0]
        litd = jnp.asarray(lit.reshape(B, Rp, 128))
        sd = jnp.asarray(starts)
        rd = jnp.asarray(recs)
        r = seqcopy(sd, rd, litd)
        r.block_until_ready()
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            r = seqcopy(sd, rd, litd)
            _ = float(np.asarray(r[0, 0, :1])[0])
            best = min(best, time.perf_counter() - t0)
        mb = sum(recs[t, 2] for t in range(nrec)) / 1e6
        print(f"{name}: {nrec} recs, {mb:.1f} MB match bytes: "
              f"{best*1e3:.1f} ms  ({best/nrec*1e9:.0f} ns/rec)",
              flush=True)


def smem():
    for cap in (1 << 14, 1 << 15, 1 << 16, 1 << 17, 1 << 18):
        try:
            recs = jnp.zeros((cap, 3), jnp.int32)
            starts = jnp.asarray([0, 10], jnp.int32)
            lit = jnp.zeros((1, 64, 128), jnp.uint8)
            r = seqcopy(starts, recs, lit)
            r.block_until_ready()
            print(f"cap {cap}: OK")
        except Exception as e:
            print(f"cap {cap}: FAIL {str(e)[:200]}")
            break


if __name__ == "__main__":
    {"correctness": correctness, "bench": bench, "smem": smem}[sys.argv[1]]()
