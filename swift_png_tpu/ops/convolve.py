"""Device pixel convolve/deconvolve (pack/unpack) kernels.

Counterpart of the reference's pixel engine (``Sources/PNG/PNG.swift:
149-1284``): big-endian atom loads, depth rescale by exact quantum multiply
or shift (``PNG.quantum``, ``PNG.swift:257-262``), palette dereference,
chroma-key application (``PNG.RGBA.swift:259-366``), and the exact integer
premultiply/straighten rationals (``PNG.swift:54-117``) — reformulated as
elementwise/gather ops over whole images so XLA can fuse them with the
wavefront defilter output.

Static parameters (depth/channels/layout) are compile-time; palette and
chroma key ride along as device arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "samples_from_rows", "rescale", "unpack_rgba", "pack_rows",
    "premultiply", "straighten",
]


def quantum(source_depth: int, dest_bits: int) -> int:
    return ((1 << dest_bits) - 1) // ((1 << source_depth) - 1)


@functools.partial(jax.jit, static_argnames=("depth", "channels", "width"))
def samples_from_rows(rows: jnp.ndarray, depth: int, channels: int,
                      width: int) -> jnp.ndarray:
    """Defiltered scanline bytes → raw samples.

    Args:
      rows: ``(H, pitch)`` uint8.
      depth: bit depth 1/2/4/8/16.
      channels: samples per pixel.
      width: pixels per row.

    Returns:
      ``(H, width, channels)`` int32 raw (unscaled) samples.
    """
    H = rows.shape[0]
    if depth == 16:
        atoms = rows.reshape(H, -1, 2).astype(jnp.int32)
        samples = (atoms[..., 0] << 8) | atoms[..., 1]
        return samples[:, : width * channels].reshape(H, width, channels)
    if depth == 8:
        return rows[:, : width * channels].reshape(
            H, width, channels).astype(jnp.int32)
    # sub-byte: MSB-first within each byte (PNG.Image.swift:186-285)
    per = 8 // depth
    n = width  # sub-byte formats are single-channel
    i = jnp.arange(n)
    byte = rows[:, i // per].astype(jnp.int32)
    shift = (per - 1 - (i % per)) * depth
    samples = (byte >> shift[None, :]) & ((1 << depth) - 1)
    return samples.reshape(H, width, 1)


def rescale(samples: jnp.ndarray, source_depth: int, dest_bits: int) -> jnp.ndarray:
    """Exact depth rescale (``PNG.swift:495-693``)."""
    dtype = jnp.uint8 if dest_bits == 8 else jnp.uint16
    if dest_bits == source_depth:
        return samples.astype(dtype)
    if dest_bits > source_depth:
        return (samples * quantum(source_depth, dest_bits)).astype(dtype)
    return (samples >> (source_depth - dest_bits)).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "channels", "is_bgr", "is_indexed",
                     "has_key", "bits"))
def samples_to_rgba(raw: jnp.ndarray, *, depth: int, channels: int,
                    is_bgr: bool = False, is_indexed: bool = False,
                    has_key: bool = False, palette: jnp.ndarray | None = None,
                    key: jnp.ndarray | None = None,
                    bits: int = 8) -> jnp.ndarray:
    """Raw samples ``(H, W, C)`` int32 → ``(H, W, 4)`` RGBA at ``bits``
    precision (``PNG.RGBA.unpack`` dispatch, ``PNG.RGBA.swift:259-366``).

    ``palette``: ``(n, 4)`` 8-bit entries; ``key``: ``(channels,)``
    raw-depth chroma key samples.
    """
    tmax = (1 << bits) - 1
    dtype = jnp.uint8 if bits == 8 else jnp.uint16
    H, width = raw.shape[0], raw.shape[1]

    if is_indexed:
        idx = raw[..., 0]
        gathered = palette.astype(jnp.int32)[idx]          # (H, W, 4) 8-bit
        return rescale(gathered, 8, bits)

    scaled = rescale(raw, depth, bits).astype(jnp.int32)
    if channels == 1:
        v = scaled[..., 0]
        alpha = jnp.full((H, width), tmax, jnp.int32)
        if has_key:
            alpha = jnp.where(raw[..., 0] == key[0], 0, tmax)
        out = jnp.stack([v, v, v, alpha], axis=-1)
    elif channels == 2:
        v = scaled[..., 0]
        out = jnp.stack([v, v, v, scaled[..., 1]], axis=-1)
    elif channels == 3:
        rgb = scaled[..., ::-1] if is_bgr else scaled
        alpha = jnp.full((H, width), tmax, jnp.int32)
        if has_key:
            alpha = jnp.where((raw == key[None, None, :]).all(-1), 0, tmax)
        out = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    else:
        if is_bgr:
            out = scaled[..., jnp.array([2, 1, 0, 3])]
        else:
            out = scaled
    return out.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "channels", "width", "is_bgr", "is_indexed",
                     "has_key", "bits"))
def unpack_rgba(rows: jnp.ndarray, *, depth: int, channels: int, width: int,
                is_bgr: bool = False, is_indexed: bool = False,
                has_key: bool = False, palette: jnp.ndarray | None = None,
                key: jnp.ndarray | None = None, bits: int = 8) -> jnp.ndarray:
    """Defiltered rows → ``(H, width, 4)`` RGBA at ``bits`` precision."""
    # rgba8/bgra8 fast path: a pure uint8 reshape (plus a channel swizzle
    # for bgr).  The general path routes through (H, W, C) int32 tensors
    # whose minor dimension of 3/4 uses 4 of 128 lanes — measured 35 ms
    # for what is logically a no-op on the bench shapes.
    if (depth == 8 and bits == 8 and channels == 4 and not is_indexed
            and not has_key):
        H = rows.shape[0]
        px = rows[:, : width * 4].reshape(H, width, 4)
        if is_bgr:
            px = px[..., jnp.array([2, 1, 0, 3])]
        return px
    raw = samples_from_rows(rows, depth, channels, width)
    return samples_to_rgba(raw, depth=depth, channels=channels,
                           is_bgr=is_bgr, is_indexed=is_indexed,
                           has_key=has_key, palette=palette, key=key,
                           bits=bits)


@functools.partial(jax.jit, static_argnames=("depth", "channels", "width"))
def pack_rows(samples: jnp.ndarray, depth: int, channels: int,
              width: int) -> jnp.ndarray:
    """Raw samples ``(H, width, channels)`` int32 → scanline bytes
    ``(H, pitch)`` uint8 (``PNG.deconvolve``, ``PNG.swift:1064-1284``)."""
    H = samples.shape[0]
    if depth == 16:
        flat = samples.reshape(H, -1)
        hi = (flat >> 8) & 0xFF
        lo = flat & 0xFF
        return jnp.stack([hi, lo], axis=-1).reshape(H, -1).astype(jnp.uint8)
    if depth == 8:
        return samples.reshape(H, -1).astype(jnp.uint8)
    per = 8 // depth
    pitch = (width * depth + 7) >> 3
    i = jnp.arange(width)
    shift = (per - 1 - (i % per)) * depth
    contrib = (samples[..., 0] & ((1 << depth) - 1)) << shift[None, :]
    # OR per-byte groups: segment-sum over byte index (shifts are disjoint)
    byte_of = i // per
    out = jax.ops.segment_sum(
        contrib.T, byte_of, num_segments=pitch, indices_are_sorted=True).T
    return out.astype(jnp.uint8)


def premultiply(color: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """``(color·alpha + max//2) / max`` exact integer premultiply
    (``PNG.premultiply``, ``PNG.swift:54-68``)."""
    tmax = 255 if color.dtype == jnp.uint8 else 65535
    product = (color.astype(jnp.uint32) * alpha.astype(jnp.uint32)
               + (tmax >> 1))
    return (product // tmax).astype(color.dtype)


def straighten(premultiplied: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Exact integer straighten (``PNG.straighten``, ``PNG.swift:101-117``);
    identity where alpha is zero."""
    tmax = 255 if premultiplied.dtype == jnp.uint8 else 65535
    # max product = 65535² + 32767 < 2³², so uint32 is exact
    a = alpha.astype(jnp.uint32)
    product = jnp.uint32(tmax) * premultiplied.astype(jnp.uint32) + (a >> 1)
    out = (product // jnp.maximum(a, 1)).astype(premultiplied.dtype)
    return jnp.where(alpha == 0, premultiplied, out)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "channels", "is_bgr", "is_indexed",
                     "has_key", "bits"))
def samples_to_va(raw: jnp.ndarray, *, depth: int, channels: int,
                  is_bgr: bool = False, is_indexed: bool = False,
                  has_key: bool = False, palette: jnp.ndarray | None = None,
                  key: jnp.ndarray | None = None,
                  bits: int = 8) -> jnp.ndarray:
    """Raw samples → ``(H, W, 2)`` value–alpha (``PNG.VA.unpack``,
    ``Sources/PNG/ColorTargets/PNG.VA.swift``): color formats contribute
    their r channel as the value."""
    tmax = (1 << bits) - 1
    dtype = jnp.uint8 if bits == 8 else jnp.uint16
    H, width = raw.shape[0], raw.shape[1]

    if is_indexed:
        idx = raw[..., 0]
        gathered = palette.astype(jnp.int32)[idx][..., jnp.array([0, 3])]
        return rescale(gathered, 8, bits)

    scaled = rescale(raw, depth, bits).astype(jnp.int32)
    if channels == 1:
        v = scaled[..., 0]
        alpha = jnp.full((H, width), tmax, jnp.int32)
        if has_key:
            alpha = jnp.where(raw[..., 0] == key[0], 0, tmax)
    elif channels == 2:
        v = scaled[..., 0]
        alpha = scaled[..., 1]
    elif channels == 3:
        v = scaled[..., 2] if is_bgr else scaled[..., 0]
        alpha = jnp.full((H, width), tmax, jnp.int32)
        if has_key:
            alpha = jnp.where((raw == key[None, None, :]).all(-1), 0, tmax)
    else:
        v = scaled[..., 2] if is_bgr else scaled[..., 0]
        alpha = scaled[..., 3]
    return jnp.stack([v, alpha], axis=-1).astype(dtype)
