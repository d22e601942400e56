"""Sequential-copy expansion for match-dominated streams.

Smooth/RLE-heavy images (gradients, UI screenshots) compress to streams
whose output is almost entirely match bytes with deep self-referential
chains — the reference resolves them byte-by-byte in its forward
overlap copy (``Sources/LZ77/Inflator/LZ77.InflatorOut.swift:124-139``);
the round-3 device path pointer-doubled over the flat output (N·log
random gathers, the measured worst case of the whole codec).

This module resolves them the TPU way for that content class:

* match tokens are rebuilt from the per-byte attribution as **merged
  uniform-distance run records** ``(pos, dist, len)`` — adjacent matches
  with the same distance merge safely because forward-copy semantics
  depend only on per-byte ``(j, d)``; smooth content collapses to a few
  thousand long records per stream;
* a Pallas kernel executes each stream's records **in order** — exact
  reference semantics, so there are no chains and no chase at all; each
  step moves up to 128 bytes as dense row ops in VMEM (aligned 16-row
  window reads, log-decomposed lane/sublane rotates, masked RMW stores);
  self-overlap (``dist < len``) doubles the copy chunk every iteration,
  so an RLE run costs ``log2(len)`` steps, not ``len``;
* streams ride the grid; records ride scalar-prefetch SMEM.

Photographic/filtered content keeps the compacted-chase path in
``inflate_checkpoint._expand`` (its records are many and short — the
per-record sequential cost measured ~1.8 µs dominates there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .inflate_checkpoint import _cumsum_mxu, _fill_last, _select_bit

__all__ = ["build_records", "seqcopy_expand", "RECORDS_SMEM_CAP"]

# scalar-prefetch operands live in SMEM (~1 MB): 3 int32 per record
RECORDS_SMEM_CAP = 1 << 16


def _compact_mask_positions(mask, cap):
    """Positions of the set bytes of ``mask`` (N,), in order, gather-free.

    Same machinery as the slot compaction in ``_expand``: per-64-byte-
    segment masks + prefix bases densely, kept-segment ids via the
    64-grouped second level, forward-fill + popcount bit select.
    Returns ``(pos (cap,) int32 — sentinel N, total, ovf)``.
    """
    SEG = 64
    N = mask.shape[0]
    Np = -(-N // SEG) * SEG
    nseg = Np // SEG
    m2 = jnp.pad(mask.astype(jnp.uint8), (0, Np - N)).reshape(nseg, SEG)
    cnt = jnp.sum(m2.astype(jnp.int32), axis=1)
    ccum = _cumsum_mxu(cnt) - cnt
    seg_has = cnt > 0
    wsh = jnp.arange(32, dtype=jnp.uint32)[None, :]
    mask_lo = jnp.sum(m2[:, :32].astype(jnp.uint32) << wsh, axis=1,
                      dtype=jnp.uint32)
    mask_hi = jnp.sum(m2[:, 32:].astype(jnp.uint32) << wsh, axis=1,
                      dtype=jnp.uint32)
    total = jnp.sum(cnt)
    nkept = jnp.sum(seg_has.astype(jnp.int32))
    tab = jnp.stack(
        [ccum,
         jax.lax.bitcast_convert_type(mask_lo, jnp.int32),
         jax.lax.bitcast_convert_type(mask_hi, jnp.int32)],
        axis=1).reshape(-1)

    ngrp = -(-nseg // SEG)
    ghm = jnp.pad(seg_has.astype(jnp.uint32),
                  (0, ngrp * SEG - nseg)).reshape(ngrp, SEG)
    gcnt = jnp.sum(ghm.astype(jnp.int32), axis=1)
    gbase = _cumsum_mxu(gcnt) - gcnt
    glo = jnp.sum(ghm[:, :32] << wsh, axis=1, dtype=jnp.uint32)
    ghi = jnp.sum(ghm[:, 32:] << wsh, axis=1, dtype=jnp.uint32)
    gi = jnp.arange(ngrp, dtype=jnp.int32)
    gt = jnp.where(gcnt > 0, gbase, cap)
    gvals = jnp.stack(
        [gi, gbase,
         jax.lax.bitcast_convert_type(glo, jnp.int32),
         jax.lax.bitcast_convert_type(ghi, jnp.int32)], axis=-1)
    grows = _fill_last(jnp.full((cap, 4), -1, jnp.int32)
                       .at[gt].set(gvals, mode="drop"))
    ks = jnp.arange(cap, dtype=jnp.int32)
    goff = _select_bit(
        jax.lax.bitcast_convert_type(grows[:, 2], jnp.uint32),
        jax.lax.bitcast_convert_type(grows[:, 3], jnp.uint32),
        ks - grows[:, 1])
    valid_k = ks < nkept
    seg_ids = jnp.where(valid_k, grows[:, 0] * SEG + goff, nseg)

    sid_c = jnp.clip(seg_ids, 0, nseg - 1)
    g3 = tab[jnp.concatenate([3 * sid_c, 3 * sid_c + 1, 3 * sid_c + 2])]
    kbase = g3[:cap]
    st = jnp.where(valid_k, kbase, cap)
    svals = jnp.stack([seg_ids, kbase, g3[cap:2 * cap], g3[2 * cap:]],
                      axis=-1)
    srows = _fill_last(jnp.full((cap, 4), -1, jnp.int32)
                       .at[st].set(svals, mode="drop"))
    ss = jnp.arange(cap, dtype=jnp.int32)
    soff = _select_bit(
        jax.lax.bitcast_convert_type(srows[:, 2], jnp.uint32),
        jax.lax.bitcast_convert_type(srows[:, 3], jnp.uint32),
        ss - srows[:, 1])
    pos = jnp.where(ss < total, jnp.minimum(srows[:, 0] * SEG + soff, N),
                    N)
    ovf = (total > cap) | (nkept > cap)
    return pos, total, ovf


def build_records(ptr, B: int, Opad: int, cap: int):
    """Merged uniform-distance run records from per-byte pointers.

    ``ptr``: flat ``(N,)`` with ``ptr[j] = j - d`` for match bytes and
    ``j`` for literals (the first ``B·Opad`` entries are stream bytes).
    Returns ``(starts (B+1,), recs (cap·3,) int32 [stream-local pos, d,
    len], ovf)`` — records in stream order, maximal same-``d`` runs
    (safe to merge: forward-copy is a per-byte ``(j, d)`` relation).
    """
    N0 = B * Opad
    j = jnp.arange(N0, dtype=jnp.int32)
    d = j - ptr[:N0]
    is_m = d > 0
    prev_d = jnp.concatenate([jnp.zeros(1, jnp.int32), d[:-1]])
    prev_m = jnp.concatenate([jnp.zeros(1, bool), is_m[:-1]])
    next_d = jnp.concatenate([d[1:], jnp.zeros(1, jnp.int32)])
    next_m = jnp.concatenate([is_m[1:], jnp.zeros(1, bool)])
    lpos = j % Opad
    bound = lpos == 0
    nbound = jnp.concatenate([bound[1:], jnp.ones(1, bool)])
    start_b = is_m & (~prev_m | (d != prev_d) | bound)
    end_b = is_m & (~next_m | (d != next_d) | nbound)
    spos, total, ovf1 = _compact_mask_positions(start_b, cap)
    epos, _, ovf2 = _compact_mask_positions(end_b, cap)
    ptr_pad = jnp.concatenate([ptr[:N0],
                               jnp.arange(N0, N0 + 1, dtype=jnp.int32)])
    sposc = jnp.clip(spos, 0, N0)
    dvals = sposc - ptr_pad[sposc]
    lens = epos - spos + 1
    valid = spos < N0
    pos_local = jnp.where(valid, sposc % Opad, 0)
    recs = jnp.stack([pos_local,
                      jnp.where(valid, dvals, 1),
                      jnp.where(valid, lens, 0)], axis=-1).reshape(-1)
    per_stream = jnp.sum(start_b.reshape(B, Opad).astype(jnp.int32),
                         axis=1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(per_stream)]).astype(jnp.int32)
    starts = jnp.minimum(starts, cap)
    return starts, recs, ovf1 | ovf2


def _seqcopy_kernel(starts_ref, recs_ref, lit_ref, out_ref):
    """Per-stream in-order record execution (see module docstring)."""
    import jax.experimental.pallas as pl

    bidx = pl.program_id(0)
    out_ref[:] = lit_ref[:]
    rs = starts_ref[bidx]
    re = starts_ref[bidx + 1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def readline(q):
        """``(1, 128)`` lanes = output bytes ``q .. q+127`` (pre-pad
        coordinates; legal sources give ``q >= -127``, landing in the 8
        leading pad rows; clamp guards hostile inputs — callers reject
        flagged streams before using the bytes)."""
        ra = jnp.maximum((q >> 7) + 8, 0)
        r = q & 127
        # dynamic sublane access must be 8-aligned: read an aligned
        # 16-row window; rotates are log-decomposed static slices
        # (tpu.dynamic_rotate does not lower for i8)
        base = pl.multiple_of((ra >> 3) << 3, 8)
        win = out_ref[pl.ds(base, 16), :]
        s = ra - base
        for k in (1, 2, 4):
            win = jnp.where(
                (s & k) != 0,
                jnp.concatenate([win[k:], win[:k]], axis=0), win)
        rot = win[0:2]
        for k in (1, 2, 4, 8, 16, 32, 64):
            rot = jnp.where(
                (r & k) != 0,
                jnp.concatenate([rot[:, k:], rot[:, :k]], axis=1),
                rot)
        return jnp.where(iota < 128 - r, rot[0:1], rot[1:2])

    def generic(pos, d, ln):
        """Forward copy in ≤128-byte chunks, chunk-doubling through
        self-overlap — any distance."""

        def cond(st):
            c, _ = st
            return c < ln

        def body(st):
            c, D = st
            tgt = pos + c
            l0 = tgt & 127
            n = jnp.minimum(jnp.minimum(D, ln - c), 128 - l0)
            comb = readline(tgt - D - l0)
            trow = (tgt >> 7) + 8
            tbase = pl.multiple_of((trow >> 3) << 3, 8)
            m = ((iota8 == trow - tbase) & (iota >= l0)
                 & (iota < l0 + n))
            cur = out_ref[pl.ds(tbase, 8), :]
            out_ref[pl.ds(tbase, 8), :] = jnp.where(
                m, jnp.broadcast_to(comb, (8, 128)), cur)
            # a full-chunk copy doubles the usable period multiple
            return c + n, jnp.where(n == D, 2 * D, D)

        jax.lax.while_loop(cond, body, (jnp.int32(0), d))
        return 0

    def tiled(pos, d, ln):
        """Pow2 ``d ≤ 128`` (the smooth-content common case: RLE and
        bpp-periodic runs): the run is ``d``-periodic and ``d | 128``,
        so one 128-lane tile serves EVERY output row — build it once
        from the final pattern bytes ``[pos-d, pos)``, then write whole
        aligned 8-row blocks with no reads and no doubling."""
        P = readline(pos - d)                  # lanes [0, d) = pattern
        # periodicize: P[l] ← P[l & (d-1)] by ascending gated doublings
        for k in (1, 2, 4, 8, 16, 32, 64):
            P = jnp.where(
                (d <= k) & ((iota & k) != 0),
                jnp.concatenate([P[:, 128 - k:], P[:, :128 - k]],
                                axis=1), P)
        # phase-align: lane l of ANY row holds byte value for
        # (l - pos) mod d (row stride 128 ≡ 0 mod d)
        a = pos & (d - 1)
        for k in (1, 2, 4, 8, 16, 32, 64):
            P = jnp.where(
                (a & k) != 0,
                jnp.concatenate([P[:, 128 - k:], P[:, :128 - k]],
                                axis=1), P)
        tile8 = jnp.broadcast_to(P, (8, 128))
        rfirst = pos >> 7
        rlast = (pos + ln - 1) >> 7
        tb0 = (rfirst >> 3) << 3
        nblk = (rlast >> 3) - (rfirst >> 3) + 1

        def blk(i, _):
            tb = tb0 + i * 8
            start_b = tb * 128
            full = (start_b >= pos) & (start_b + 1024 <= pos + ln)
            tbp = pl.multiple_of(tb + 8, 8)

            def full_store(_):
                out_ref[pl.ds(tbp, 8), :] = tile8
                return 0

            def rmw(_):
                flat = (tb + iota8) * 128 + iota
                m = (flat >= pos) & (flat < pos + ln)
                cur = out_ref[pl.ds(tbp, 8), :]
                out_ref[pl.ds(tbp, 8), :] = jnp.where(m, tile8, cur)
                return 0

            jax.lax.cond(full, full_store, rmw, 0)
            return 0

        jax.lax.fori_loop(0, nblk, blk, 0)
        return 0

    def token(t, _):
        pos = recs_ref[3 * t]
        d = recs_ref[3 * t + 1]
        ln = recs_ref[3 * t + 2]
        jax.lax.cond((d <= 128) & ((d & (d - 1)) == 0), tiled, generic,
                     pos, d, ln)
        return 0

    jax.lax.fori_loop(rs, re, token, 0)


@functools.partial(jax.jit, static_argnames=("B", "Opad", "interpret"))
def seqcopy_expand(starts, recs, lit_flat, *, B: int, Opad: int,
                   interpret: bool = False):
    """Run the sequential-copy kernel over ``B`` streams.

    ``lit_flat``: ``(B·Opad,)`` uint8 literal-placed bytes (match bytes
    arbitrary).  Returns the fully expanded ``(B·Opad,)`` bytes.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert Opad % 128 == 0
    Rp = Opad // 128
    Rpp = -(-(Rp + 24) // 8) * 8
    lit = jnp.concatenate(
        [jnp.zeros((B, 8, 128), jnp.uint8),
         lit_flat.reshape(B, Rp, 128),
         jnp.zeros((B, Rpp - Rp - 8, 128), jnp.uint8)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Rpp, 128), lambda b, s, r: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Rpp, 128), lambda b, s, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kern(starts_ref, recs_ref, lit_ref, out_ref):
        _seqcopy_kernel(starts_ref, recs_ref, lit_ref.at[0], out_ref.at[0])

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Rpp, 128), jnp.uint8),
        interpret=interpret,
    )(starts, recs, lit)
    return out[:, 8:8 + Rp].reshape(-1)
