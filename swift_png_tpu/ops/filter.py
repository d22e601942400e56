"""Encode-side filter select (TPU kernel tier).

``PNG.Encoder.filter`` computes five filtered candidates per scanline and
keeps the one with the minimum sum-of-absolute-Int8 score
(``Sources/PNG/Encoding/PNG.Encoder.swift:132-234``, ``score`` at
``:230-234``).  Because every candidate references the *raw* previous
scanline (``last = cur`` in the row loop, ``PNG.Encoder.swift:101``), there
is no inter-row dependency at all — the reference's own comment notes
"filtering can be done in parallel" (``PNG.Encoder.swift:134``).  Here all
five candidates for all rows of a whole image (or batch of images) are
computed in one vectorized pass and reduced per row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["filter_select", "filter_select_batch"]


def _shift_right(x: jnp.ndarray, delay: int) -> jnp.ndarray:
    """x[..., i - delay] with zero fill (the channel-delay left neighbor)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(delay, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


@functools.partial(jax.jit, static_argnames=("delay",))
def filter_select(rows: jnp.ndarray, delay: int) -> jnp.ndarray:
    """Filter every scanline of one image, picking the best filter per row.

    Args:
      rows: ``(H, pitch)`` uint8 raw scanline bytes.
      delay: pixel stride in bytes.

    Returns:
      ``(H, 1 + pitch)`` uint8: per-row ``[filter_byte, filtered…]``, ties
      resolved toward the lowest filter index like the host tier.
    """
    cur = rows.astype(jnp.int32)
    prev = jnp.pad(cur, ((1, 0), (0, 0)))[:-1]           # raw row above, 0 at top
    a = _shift_right(cur, delay)
    c = _shift_right(prev, delay)

    none = cur
    sub = cur - a
    up = cur - prev
    average = cur - ((a + prev) >> 1)
    pa = jnp.abs(prev - c)
    pb = jnp.abs(a - c)
    pc = jnp.abs(a + prev - 2 * c)
    paeth_pred = jnp.where((pa <= pb) & (pa <= pc), a,
                           jnp.where(pb <= pc, prev, c))
    paeth = cur - paeth_pred

    cand = jnp.stack([none, sub, up, average, paeth]) & 0xFF   # (5, H, pitch)
    # score: sum of |Int8 reinterpretation| (PNG.Encoder.swift:230-234)
    as_i8 = jnp.where(cand > 127, cand - 256, cand)
    scores = jnp.abs(as_i8).sum(axis=-1)                       # (5, H)
    best = jnp.argmin(scores, axis=0)                          # (H,) first min wins
    chosen = jnp.take_along_axis(cand, best[None, :, None], axis=0)[0]
    out = jnp.concatenate(
        [best[:, None].astype(jnp.uint8), chosen.astype(jnp.uint8)], axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("delay",))
def filter_select_batch(rows: jnp.ndarray, delay: int) -> jnp.ndarray:
    """Batched filter select: ``(B, H, pitch) → (B, H, 1+pitch)``."""
    return jax.vmap(lambda r: filter_select(r, delay))(rows)
