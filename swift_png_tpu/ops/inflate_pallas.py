"""Pallas lockstep inflate kernel: token decode + byte stamping in VMEM.

Why a kernel: measured on this TPU, every XLA random-access element costs
~13 ns while VPU elementwise streams at teraops.  The lockstep decoder's
per-step work is all *small-domain* selects — a 32-bit word from the
unit's span, a symbol attribute from a ≤288-entry table — which a kernel
expresses as compare-and-reduce one-hots over VMEM-resident rows, never
touching a gather.  The XLA fallback (``inflate_checkpoint.decode_tokens``)
does the same algorithm with per-unit gathers; this kernel is the
production path.

Layout: units are tiled ``(TUr, 128)`` (sublanes × lanes); per-unit spans
ride along a trailing lane dimension ``S``; per-stream decode tables are
packed scalars + two attribute rows.  Each step decodes one token per
unit and *stamps* its packed attribute over the unit's output-byte lanes:

  ``attr[b] < 0`` → literal value ``-(attr+1)``; ``attr[b] > 0`` → match
  distance; ``attr[b] == 0`` → not covered (validity check).

The stamp replaces both the scatter-based and the rank-count assemblies —
``cursor`` lives in registers, so token→byte attribution costs a masked
select instead of any indexed write (the reference's sequential
``InflatorOut.append``/``expand`` analog, ``Sources/LZ77/Inflator/
LZ77.InflatorOut.swift:124-139``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lz77 import constants as C

__all__ = ["decode_stamp_pallas", "prepare_tables"]

TUB = 1024         # units per tile
TUR = TUB // 128   # sublane rows of units per tile


def prepare_tables(lit_lengths: np.ndarray, dist_lengths: np.ndarray):
    """Per-stream packed decode tables for the kernel (host, numpy).

    Returns ``(params (128,) int32, lit_attr (384,) int32,
    dist_attr (128,) int32)``:

    * ``params[l]`` (1…15) — literal canonical thresholds
      ``lim[l] << (15-l)`` (non-decreasing, so code length =
      1 + #{thresholds ≤ window}); ``params[16+l]`` — ``offset[l] -
      first[l]`` so ``symidx = code + adj``; ``params[32+l]`` /
      ``params[48+l]`` — the same for the distance tree.
    * ``lit_attr[symidx]`` — ``sym | run_extra<<10 | run_base<<13`` of the
      length-sorted symbol at ``symidx``.
    * ``dist_attr[symidx]`` — ``extra | base<<4``, or ``1<<30`` for the
      two reserved distance codes 30/31.
    """

    def canonical(lengths):
        lengths = np.asarray(lengths, np.int64)
        counts = np.bincount(lengths[lengths > 0], minlength=16)[:16]
        first = np.zeros(16, np.int64)
        f = 0
        for l in range(1, 16):
            first[l] = f
            f = (f + counts[l]) << 1
        lim = first + counts
        offset = np.zeros(16, np.int64)
        offset[1:] = np.cumsum(counts)[:-1]
        order = np.argsort(np.where(lengths > 0, lengths, 99) * 1024
                           + np.arange(lengths.size), kind="stable")
        return counts, first, lim, offset, order

    _, lfirst, llim, loffset, lorder = canonical(lit_lengths)
    _, dfirst, dlim, doffset, dorder = canonical(dist_lengths)
    params = np.zeros(128, np.int32)
    for l in range(1, 16):
        params[l] = llim[l] << (15 - l)
        params[16 + l] = loffset[l] - lfirst[l]
        params[32 + l] = dlim[l] << (15 - l)
        params[48 + l] = doffset[l] - dfirst[l]

    lit_attr = np.zeros(384, np.int32)
    for idx in range(288):
        sym = int(lorder[idx])
        if sym >= 257:
            dec = sym - 257
            if dec <= 28:
                lit_attr[idx] = (sym | int(C.RUN_EXTRA[dec]) << 10
                                 | int(C.RUN_BASE[dec]) << 13)
            else:
                lit_attr[idx] = 1 << 30  # symbols 286/287 are reserved
        else:
            lit_attr[idx] = sym
    dist_attr = np.zeros(128, np.int32)
    for idx in range(32):
        sym = int(dorder[idx])
        if sym <= 29:
            dist_attr[idx] = (int(C.DISTANCE_EXTRA[sym])
                              | int(C.DISTANCE_BASE[sym]) << 4)
        else:
            dist_attr[idx] = 1 << 30
    return params, lit_attr, dist_attr


def _rev15(x):
    """Bit-reverse the low 15 bits (uint32 lanes)."""
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x >> 1


def _make_kernel(S: int, ob: int, k_max: int):
    import jax.experimental.pallas as pl  # deferred: CPU tests import-safe

    def kernel(spans_ref, meta_ref, params_ref, lit_attr_ref, dist_attr_ref,
               attr_ref, flag_ref):
        # Transposed layout: units ride the LANE dimension, one-hot
        # domains (span words, symbol tables, output bytes) ride the
        # SUBLANE dimension — Mosaic reduces over sublanes with plain
        # vreg adds, whereas lane reductions cost log2(128) shuffle
        # passes per select (measured ~5x the whole step).
        spans = jax.lax.bitcast_convert_type(spans_ref[0], jnp.int32)
        sub0 = meta_ref[0]
        skip = meta_ref[1]
        owned = meta_ref[2]  # live bytes of this unit (<= ob; 0 = padding)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (TUR, S, 128), 1)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (TUR, ob, 128), 1)
        iota_la = jax.lax.broadcasted_iota(jnp.int32, (TUR, 384, 128), 1)
        iota_da = jax.lax.broadcasted_iota(jnp.int32, (TUR, 32, 128), 1)
        lit_attr = lit_attr_ref[0][None, :, :]    # (1, 384, 128)
        dist_attr = dist_attr_ref[0][None, :, :]  # (1, 32, 128)

        # hoist all per-stream scalars out of the step loop — Mosaic does
        # not CSE the VMEM scalar extracts, and ~60 of them per step is
        # real per-step cost
        p_lit_T = [params_ref[0, 0, t] for t in range(1, 16)]
        p_lit_adj = [params_ref[0, 0, 16 + t] for t in range(1, 16)]
        p_dist_T = [params_ref[0, 0, 32 + t] for t in range(1, 16)]
        p_dist_adj = [params_ref[0, 0, 48 + t] for t in range(1, 16)]

        def sel16(lsel, scalars):
            """scalars[l-1] per unit (one-hot over the 15 lengths)."""
            acc = jnp.zeros((TUR, 128), jnp.int32)
            for t in range(1, 16):
                acc = acc + jnp.where(lsel == t, scalars[t - 1], 0)
            return acc

        def body(k, carry):
            bitrel, cur, flag = carry
            active = cur < owned
            # three consecutive span words with one shared offset grid:
            # the whole <=48-bit token lives in words widx..widx+2 because
            # lit code + run extra consume <= 20 bits (sub <= 31 => the
            # distance window starts in word widx or widx+1)
            d3 = iota_s - (bitrel >> 5)[:, None, :]
            w0 = jax.lax.bitcast_convert_type(
                jnp.sum(jnp.where(d3 == 0, spans, 0), axis=1), jnp.uint32)
            w1 = jax.lax.bitcast_convert_type(
                jnp.sum(jnp.where(d3 == 1, spans, 0), axis=1), jnp.uint32)
            w2 = jax.lax.bitcast_convert_type(
                jnp.sum(jnp.where(d3 == 2, spans, 0), axis=1), jnp.uint32)
            sub = (bitrel & 31).astype(jnp.uint32)
            win = (w0 >> sub) | jnp.where(
                sub == 0, jnp.uint32(0), w1 << ((32 - sub) & 31))

            r15 = _rev15(win & 0x7FFF).astype(jnp.int32)
            l = jnp.ones((TUR, 128), jnp.int32)
            for t in range(1, 16):
                l = l + (r15 >= p_lit_T[t - 1]).astype(jnp.int32)
            lbad = l > 15
            ls = jnp.minimum(l, 15)
            code = r15 >> (15 - ls)
            symidx = jnp.clip(code + sel16(ls, p_lit_adj), 0, 383)
            attr = jnp.sum(
                jnp.where(iota_la == symidx[:, None, :], lit_attr, 0),
                axis=1)
            sym = attr & 0x3FF
            eb = (attr >> 10) & 7
            rbase = (attr >> 13) & 0x1FF
            run = rbase + ((win >> ls.astype(jnp.uint32)).astype(jnp.int32)
                           & ((1 << eb) - 1))
            is_lit = ~lbad & (sym < 256)
            is_eob = ~lbad & (sym == 256)
            is_run = ~lbad & (sym >= 257) & (attr < (1 << 30))

            bit2 = bitrel + ls + eb
            hi_word = (bit2 >> 5) > (bitrel >> 5)
            wa = jnp.where(hi_word, w1, w0)
            wb = jnp.where(hi_word, w2, w1)
            sub2 = (bit2 & 31).astype(jnp.uint32)
            win2 = (wa >> sub2) | jnp.where(
                sub2 == 0, jnp.uint32(0), wb << ((32 - sub2) & 31))

            r15d = _rev15(win2 & 0x7FFF).astype(jnp.int32)
            dl = jnp.ones((TUR, 128), jnp.int32)
            for t in range(1, 16):
                dl = dl + (r15d >= p_dist_T[t - 1]).astype(jnp.int32)
            dbad = dl > 15
            dls = jnp.minimum(dl, 15)
            dcode = r15d >> (15 - dls)
            didx = jnp.clip(dcode + sel16(dls, p_dist_adj), 0, 31)
            dattr = jnp.sum(
                jnp.where(iota_da == didx[:, None, :], dist_attr, 0),
                axis=1)
            db = dattr & 15
            dist = ((dattr >> 4) & 0x7FFF) + (
                (win2 >> dls.astype(jnp.uint32)).astype(jnp.int32)
                & ((1 << db) - 1))
            is_match = is_run & ~dbad & (dattr < (1 << 30))

            bad = active & (lbad | is_eob | (is_run & ~is_match))
            tl = jnp.where(active & is_lit, 1,
                           jnp.where(active & is_match, run, 0))
            aux = jnp.where(is_lit, -(sym + 1), dist)
            # monotone stamp: tokens arrive in increasing byte order, so
            # stamping the whole tail [cur, ob) is correct — later tokens
            # overwrite it; bytes past the last token stay garbage and are
            # guarded by the coverage flag + live mask downstream
            start = jnp.where(active & (tl > 0), cur, ob)  # ob => no stamp
            mask = iota_b >= start[:, None, :]
            attr_ref[0] = jnp.where(mask, aux[:, None, :], attr_ref[0])
            step = jnp.where(is_lit, ls, ls + eb + dls + db)
            bitrel = bitrel + jnp.where(active & ~bad, step, 0)
            flag = flag | jnp.where(bad, 1, 0)
            return bitrel, cur + tl, flag

        bitrel0 = sub0
        cur0 = -skip
        flag0 = jnp.zeros((TUR, 128), jnp.int32)
        attr_ref[0] = jnp.zeros((TUR, ob, 128), jnp.int32)
        bitrel, cur, flag = jax.lax.fori_loop(
            0, k_max, body, (bitrel0, cur0, flag0))
        # coverage: every owned byte must be stamped (the last unit of a
        # stream owns < ob bytes; padding units own 0)
        flag = flag | jnp.where(cur < owned, 2, 0)
        flag_ref[...] = flag

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "ob", "k_max",
                                             "tiles_per_stream",
                                             "interpret"))
def decode_stamp_pallas(spans, meta, params, lit_attr, dist_attr, *,
                        S: int, ob: int, k_max: int, tiles_per_stream: int,
                        interpret: bool = False):
    """Run the lockstep decode+stamp kernel over all unit tiles.

    Args:
      spans: ``(T, TUR, S, 128)`` uint32 — per-unit span words,
        transposed so units ride lanes: word ``s`` of unit
        ``t·1024 + g·128 + l`` sits at ``[t, g, s, l]``.
      meta: ``(3, Ur, 128)`` int32 — sub-bit, skip, owned bytes per unit
        (termination is by output coverage: a unit decodes until its
        cursor reaches its owned byte count).
      params: ``(B, 8, 128)`` int32 — packed per-stream scalars (row 0).
      lit_attr/dist_attr: ``(B, 384, 128)`` / ``(B, 32, 128)`` int32 —
        per-stream attribute tables replicated across lanes.
      tiles_per_stream: unit tiles per stream (``Ui_pad / 1024``).

    Returns ``(attr (T, TUR, ob, 128) int32, flag (Ur, 128) int32)``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = spans.shape[0]
    Ur = n_tiles * TUR
    kernel = _make_kernel(S, ob, k_max)
    attr, flag = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TUR, S, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TUR, 128), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t: (t // tiles_per_stream,
                                                 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 384, 128), lambda t: (t // tiles_per_stream,
                                                   0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, 128), lambda t: (t // tiles_per_stream,
                                                  0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TUR, ob, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TUR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TUR, ob, 128), jnp.int32),
            jax.ShapeDtypeStruct((Ur, 128), jnp.int32),
        ],
        interpret=interpret,
    )(spans, meta, params, lit_attr, dist_attr)
    return attr, flag
