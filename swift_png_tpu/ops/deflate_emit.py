"""In-kernel term emission: packed DeflatorTerm → (lo, hi, nbits).

``pack_terms32`` resolves each term's Huffman codes with two table
gathers — ~8.6 ns/term on this chip, ~21 ms per 1 MB image, the single
largest packing cost.  This kernel replaces the gathers with the decode
kernel's trick in reverse: the (≤318-row) emit table lives on sublanes
in VMEM, each 128-token lane row builds a one-hot against a constant
row-index iota, and the code value falls out of an elementwise
multiply-accumulate + sublane sum — ~1.6 vector-register ops per token
instead of a priced gather index.

Per-image tables ride a scalar-prefetch-driven block index map
(``tile // tiles_per_image``), so one program serves the whole batch.
Emit-table packing (host): one int32 per symbol, ``bits | len << 16``;
literal/run symbols at rows 0..287, distance decades at 288..317.
Extra-bit fields come from the RFC 1951 closed forms, exactly as
``pack_terms32``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["emit_terms_batch", "pack_emit_table", "ROWS"]

ROWS = 320  # 288 lit/run + 30 distance rows, padded to a multiple of 8


def pack_emit_table(lit_bits, lit_len, dist_bits, dist_len) -> np.ndarray:
    """(320,) int32 combined emit table for one image."""
    t = np.zeros(ROWS, np.int32)
    t[:288] = np.asarray(lit_bits) | (np.asarray(lit_len) << 16)
    t[288:288 + 30] = (np.asarray(dist_bits)[:30]
                       | (np.asarray(dist_len)[:30] << 16))
    return t


def _emit_kernel(tpi_ref, terms_ref, tab_ref, lo_ref, hi_ref, nb_ref):
    del tpi_ref  # consumed by the table block index map
    tabv = tab_ref[0]                           # (ROWS, 128)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
    NB = terms_ref.shape[1]

    def place(lo, hi, piece, width, off):
        sh = off & 31
        in_hi = off >= 32
        shifted = piece << sh
        spill = jnp.where(sh == 0, 0,
                          ((piece >> 1) & 0x7FFFFFFF) >> (31 - sh))
        lo = lo | jnp.where(in_hi, 0, shifted)
        hi = hi | jnp.where(in_hi, shifted, spill)
        return lo, hi, off + width

    def step(i, _):
        base = pl.multiple_of(i * 8, 8)
        t = terms_ref[0, pl.ds(base, 8), :]
        tu = t.astype(jnp.uint32)
        is_lit = ((tu >> 27) == 31) & ((tu & 0x100) == 0)
        litv = t & 0xFF
        rd = jnp.clip(t & 0xFF, 0, 28)
        dd = jnp.clip((tu >> 27).astype(jnp.int32), 0, 29)
        run_extra = ((tu >> 9) & 0x1F).astype(jnp.int32)
        dist_extra = ((tu >> 14) & 0x1FFF).astype(jnp.int32)
        sym = jnp.where(is_lit, litv, 257 + rd)

        los, his, offs = [], [], []
        for r in range(8):
            srow = sym[r:r + 1]
            lv = jnp.sum(jnp.where(rowid == srow, tabv, 0), axis=0,
                         keepdims=True)
            lo_r = jnp.zeros((1, 128), jnp.int32)
            hi_r = jnp.zeros((1, 128), jnp.int32)
            lo_r, hi_r, off_r = place(lo_r, hi_r, lv & 0xFFFF, lv >> 16,
                                      jnp.zeros((1, 128), jnp.int32))
            rd_r = rd[r:r + 1]
            dd_r = dd[r:r + 1]
            lit_r = is_lit[r:r + 1]
            reb = jnp.where(lit_r | (rd_r < 4) | (rd_r == 28), 0,
                            (rd_r >> 2) - 1)
            lo_r, hi_r, off_r = place(
                lo_r, hi_r, jnp.where(lit_r, 0, run_extra[r:r + 1]),
                reb, off_r)
            dv = jnp.sum(jnp.where(rowid == 288 + dd_r, tabv, 0), axis=0,
                         keepdims=True)
            dn = jnp.where(lit_r, 0, dv >> 16)
            lo_r, hi_r, off_r = place(
                lo_r, hi_r, jnp.where(lit_r, 0, dv & 0xFFFF), dn, off_r)
            deb = jnp.where(lit_r | (dd_r < 4), 0, (dd_r >> 1) - 1)
            lo_r, hi_r, off_r = place(
                lo_r, hi_r, jnp.where(lit_r, 0, dist_extra[r:r + 1]),
                deb, off_r)
            los.append(lo_r)
            his.append(hi_r)
            offs.append(off_r)
        lo_ref[0, pl.ds(base, 8), :] = jnp.concatenate(los, axis=0)
        hi_ref[0, pl.ds(base, 8), :] = jnp.concatenate(his, axis=0)
        nb_ref[0, pl.ds(base, 8), :] = jnp.concatenate(offs, axis=0)
        return 0

    jax.lax.fori_loop(0, NB // 8, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def emit_terms_batch(terms, tabs, tpi_arr, *, interpret: bool = False):
    """Batched term emission.

    Args:
      terms: ``(Tc, NB, 128)`` int32 packed DeflatorTerm grid (the DP
        kernel's output layout; ``Tc = B·tpi``).
      tabs: ``(B, ROWS, 128)`` int32 per-image emit tables, broadcast
        along lanes (:func:`pack_emit_table` rows tiled 128-wide).
      tpi_arr: ``(1,)`` int32 — tiles per image (scalar prefetch; the
        table block index map divides by it).

    Returns ``(lo, hi, nbits)`` each ``(Tc, NB, 128)`` int32 — same
    values as :func:`swift_png_tpu.ops.deflate.pack_terms32`.
    """
    Tc, NB, _ = terms.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((1, NB, 128), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, 128), lambda t, s: (t // s[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NB, 128), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM)] * 3,
    )
    sh = jax.ShapeDtypeStruct((Tc, NB, 128), jnp.int32)
    return pl.pallas_call(
        _emit_kernel,
        grid_spec=grid_spec,
        out_shape=[sh, sh, sh],
        interpret=interpret,
    )(tpi_arr, terms, tabs)
