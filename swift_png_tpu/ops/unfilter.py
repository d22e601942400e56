"""Wavefront scanline defilter (TPU kernel tier).

The reference defilters one scanline at a time with a serial intra-row carry
(``PNG.Decoder.defilter``, ``Sources/PNG/Decoding/PNG.Decoder.swift:152-196``;
branchless Paeth at ``Sources/PNG/PNG.swift:123-147``).  Byte ``(y, i)`` of
the defiltered image depends on

* ``a`` = byte ``(y, i-delay)``  (left neighbor, same pixel lane),
* ``b`` = byte ``(y-1, i)``      (above),
* ``c`` = byte ``(y-1, i-delay)`` (above-left),

where ``delay`` is the pixel stride in bytes (channel count × byte depth,
``PNG.Decoder.swift:84``).  Grouping bytes into pixels ``g = i // delay``,
the dependency graph is the classic 2D wavefront: cell ``(y, g)`` needs
``(y, g-1)``, ``(y-1, g)`` and ``(y-1, g-1)``.  Anti-diagonals ``d = y + g``
are therefore mutually independent — instead of ``H×G`` serial steps we run
``H+G-1`` scan steps, each one a fully vectorized ``(H, delay)`` elementwise
update (batched over images on the leading axis).  This is the TPU-native
formulation: static shapes, one `lax.scan`, no gathers inside the loop.

All five filter types run through the same wavefront (``pred`` selected per
row), so scan structure does not depend on the data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["defilter", "defilter_batch"]


def _predict(ftype: jnp.ndarray, a, b, c):
    """Per-element filter prediction; ``ftype`` broadcasts per row.

    Unknown filter types predict 0 (pass-through), matching the host tier
    and the reference's behavior for invalid codes.
    """
    avg = (a + b) >> 1
    pa = jnp.abs(b - c)
    pb = jnp.abs(a - c)
    pc = jnp.abs(a + b - 2 * c)
    paeth = jnp.where((pa <= pb) & (pa <= pc), a, jnp.where(pb <= pc, b, c))
    pred = jnp.where(ftype == 1, a, 0)
    pred = jnp.where(ftype == 2, b, pred)
    pred = jnp.where(ftype == 3, avg, pred)
    pred = jnp.where(ftype == 4, paeth, pred)
    return pred


@functools.partial(jax.jit, static_argnames=("delay",))
def defilter(filtered: jnp.ndarray, delay: int) -> jnp.ndarray:
    """Defilter one image's scanlines.

    Args:
      filtered: ``(H, 1 + pitch)`` uint8 — each row is ``[filter_byte,
        data…]`` exactly as pulled from the inflator
        (``PNG.Decoder.swift:88``).  ``pitch`` must be a multiple of
        ``delay`` (true for every PNG format: sub-byte formats have
        ``delay == 1``).
      delay: pixel stride in bytes (1…8).

    Returns:
      ``(H, pitch)`` uint8 defiltered bytes.
    """
    H, pitch1 = filtered.shape
    pitch = pitch1 - 1
    if pitch % delay:
        raise ValueError(f"pitch {pitch} not a multiple of delay {delay}")
    G = pitch // delay
    Dn = H + G - 1

    ftype = filtered[:, 0].astype(jnp.int32)[:, None]  # (H, 1)
    data = filtered[:, 1:].reshape(H, G, delay)

    # K diagonals per scan step: the per-step body is tiny (H·delay
    # elements), so the scan's per-iteration overhead dominates the
    # whole defilter — chunking cuts the iteration count K-fold while
    # the K inner updates stay one fused loop body
    K = 8
    Dn_pad = -(-Dn // K) * K

    # skew: S[d, y] = data[y, d - y] (zeros where g out of range)
    y_idx = jnp.arange(H)
    d_idx = jnp.arange(Dn_pad)
    g = d_idx[:, None] - y_idx[None, :]                      # (Dn_pad, H)
    valid = (g >= 0) & (g < G)
    S = jnp.take_along_axis(
        data.transpose(1, 0, 2)[None],                       # (1, G, H, delay)
        jnp.clip(g, 0, G - 1)[:, None, :, None],             # (Dn_pad, 1, H, 1)
        axis=1,
    )[:, 0]                                                  # (Dn_pad, H, delay)
    S = jnp.where(valid[:, :, None], S, 0)

    zrow = jnp.zeros((1, delay), jnp.uint8)

    def step(carry, xs):
        col_m1, col_m2 = carry                               # (H, delay) u8
        xk, vk = xs                                  # (K, H, delay), (K, H)
        outs = []
        for k in range(K):
            a = col_m1.astype(jnp.int32)
            b = jnp.concatenate([zrow, col_m1[:-1]]).astype(jnp.int32)
            c = jnp.concatenate([zrow, col_m2[:-1]]).astype(jnp.int32)
            out = (xk[k].astype(jnp.int32)
                   + _predict(ftype, a, b, c)) & 0xFF
            out = jnp.where(vk[k][:, None], out, 0).astype(jnp.uint8)
            col_m1, col_m2 = out, col_m1
            outs.append(out)
        return (col_m1, col_m2), jnp.stack(outs)

    _, outs = jax.lax.scan(
        step, (zrow.repeat(H, 0), zrow.repeat(H, 0)),
        (S.reshape(Dn_pad // K, K, H, delay),
         valid.reshape(Dn_pad // K, K, H)))
    outs = outs.reshape(Dn_pad, H, delay)
    # unskew: O[y, g] = outs[y + g, y]
    d_of = (y_idx[:, None] + jnp.arange(G)[None, :])         # (H, G)
    O = jnp.take_along_axis(
        outs.transpose(1, 0, 2),                             # (H, Dn, delay)
        d_of[:, :, None],
        axis=1,
    )
    return O.reshape(H, pitch)


@functools.partial(jax.jit, static_argnames=("delay",))
def defilter_batch(filtered: jnp.ndarray, delay: int) -> jnp.ndarray:
    """Defilter a batch of same-shaped images: ``(B, H, 1+pitch) → (B, H,
    pitch)``.  This is the codec's data-parallel axis (SURVEY.md §2.4.1).

    Batch-LAST layout (measured): the vmapped single-image wavefront
    keeps ``delay`` (1…8) as the minor dimension, so every elementwise
    op uses ``delay`` of 128 lanes and the whole defilter ran at
    0.48 GB/s.  Here the batch rides the minor axis — tensors are
    ``(…, H, delay·B)``, shifts along ``H`` are dense row slices, and
    the skew/unskew are pad+reshape tricks on 128-wide rows (row ``y``
    shifted right by ``y`` == reshaping an ``(H, W2)`` buffer to rows of
    length ``W2-1``) — no gathers anywhere.
    """
    B, H, pitch1 = filtered.shape
    pitch = pitch1 - 1
    if pitch % delay:
        raise ValueError(f"pitch {pitch} not a multiple of delay {delay}")
    if B == 1:
        return jax.vmap(lambda f: defilter(f, delay))(filtered)
    G = pitch // delay
    Dn = H + G - 1
    K = 8
    Dn_pad = -(-Dn // K) * K
    L = delay * B

    ftype = filtered[:, :, 0].astype(jnp.int32)          # (B, H)
    ft = jnp.broadcast_to(
        jnp.transpose(ftype, (1, 0))[:, None, None, :],
        (H, 1, delay, B)).reshape(H, 1, L)               # (H, 1, L)
    # batch to the minor axis: (B, H, G, delay) → (H, G, delay, B)
    data = jnp.transpose(
        filtered[:, :, 1:].reshape(B, H, G, delay), (1, 2, 3, 0))
    data = data.reshape(H, G, L)

    # skew: S[d, y] = data[y, d-y] — pad rows to W2 = Dn_pad+1 and view
    # as rows of length Dn_pad (row y lands shifted right by y); invalid
    # (d-y out of range) positions read the zero padding
    W2 = Dn_pad + 1
    padded = jnp.concatenate(
        [data, jnp.zeros((H, W2 - G, L), jnp.uint8)], axis=1)
    sk = padded.reshape(H * W2, L)[: H * Dn_pad].reshape(H, Dn_pad, L)
    S = jnp.transpose(sk, (1, 0, 2))                     # (Dn_pad, H, L)

    zrow = jnp.zeros((1, L), jnp.uint8)
    d_idx = jnp.arange(Dn_pad)
    y_idx = jnp.arange(H)
    valid = ((d_idx[:, None] - y_idx[None, :] >= 0)
             & (d_idx[:, None] - y_idx[None, :] < G))    # (Dn_pad, H)

    def step(carry, xs):
        col_m1, col_m2 = carry                           # (H, L) u8
        xk, vk = xs                                      # (K, H, L), (K, H)
        outs = []
        for k in range(K):
            a = col_m1.astype(jnp.int32)
            b = jnp.concatenate([zrow, col_m1[:-1]]).astype(jnp.int32)
            c = jnp.concatenate([zrow, col_m2[:-1]]).astype(jnp.int32)
            out = (xk[k].astype(jnp.int32)
                   + _predict(ft[:, 0], a, b, c)) & 0xFF
            out = jnp.where(vk[k][:, None], out, 0).astype(jnp.uint8)
            col_m1, col_m2 = out, col_m1
            outs.append(out)
        return (col_m1, col_m2), jnp.stack(outs)

    _, outs = jax.lax.scan(
        step, (zrow.repeat(H, 0), zrow.repeat(H, 0)),
        (S.reshape(Dn_pad // K, K, H, L),
         valid.reshape(Dn_pad // K, K, H)))
    outs = outs.reshape(Dn_pad, H, L)

    # unskew: O[y, g] = outs[y+g, y] — transpose to (H, Dn_pad, L), then
    # rows of length Dn_pad+1 shift row y LEFT by y
    T = jnp.transpose(outs, (1, 0, 2)).reshape(H * Dn_pad, L)
    T = jnp.concatenate([T, jnp.zeros((H, L), jnp.uint8)])
    O = T[: H * W2].reshape(H, W2, L)[:, :G]             # (H, G, L)
    return jnp.transpose(O.reshape(H, G, delay, B),
                         (3, 0, 1, 2)).reshape(B, H, pitch)


def defilter_reference(filtered: np.ndarray, delay: int) -> np.ndarray:
    """Host oracle for tests: row-serial defilter via the host tier."""
    from ..png.decoder import defilter as host_defilter

    H = filtered.shape[0]
    out = np.empty((H, filtered.shape[1] - 1), np.uint8)
    last = np.zeros(filtered.shape[1], np.uint8)
    for y in range(H):
        line = filtered[y].copy()
        host_defilter(line, last, delay)
        out[y] = line[1:]
        last = line
    return out
