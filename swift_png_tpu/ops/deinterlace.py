"""Adam7 deinterlace on device.

The reference assigns each interlaced scanline into the final image with a
strided per-pixel loop (``PNG.Image.assign(scanline:at:stride:)``,
``Sources/PNG/PNG.Image.swift:186-285``).  Here the whole interlaced stream
is decoded at once: the fused inflate yields every pass's filtered
scanlines back-to-back; each pass defilters independently (the wavefront
kernel) and its samples land in the final ``(H, W, C)`` grid with one
strided scatter per pass.  Pass geometry is static per image size, so the
seven scatters compile into one fused program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .convolve import samples_from_rows
from .unfilter import defilter

#: Adam7 (base, stride) table — ``PNG.Decoder.swift:5-15``
ADAM7 = (
    ((0, 0), (8, 8)),
    ((4, 0), (8, 8)),
    ((0, 4), (4, 8)),
    ((2, 0), (4, 4)),
    ((0, 2), (2, 4)),
    ((1, 0), (2, 2)),
    ((0, 1), (1, 2)),
)

__all__ = ["ADAM7", "pass_geometry", "deinterlace_samples"]


def pass_geometry(size: tuple[int, int], volume: int):
    """Static layout of the interlaced stream: per non-empty pass,
    ``(z, sub_x, sub_y, pitch, byte_offset)``."""
    W, H = size
    out = []
    offset = 0
    for z, ((bx, by), (sx, sy)) in enumerate(ADAM7):
        sub_x = (W + sx - bx - 1) // sx
        sub_y = (H + sy - by - 1) // sy
        if sub_x <= 0 or sub_y <= 0:
            continue
        pitch = (sub_x * volume + 7) >> 3
        out.append((z, sub_x, sub_y, pitch, offset))
        offset += sub_y * (pitch + 1)
    return out, offset


@functools.partial(
    jax.jit, static_argnames=("size", "depth", "channels"))
def deinterlace_samples(flat: jnp.ndarray, *, size: tuple[int, int],
                        depth: int, channels: int) -> jnp.ndarray:
    """Interlaced filtered stream → full-image raw samples.

    Args:
      flat: the decompressed interlaced byte stream (≥ total length).
      size: (W, H).

    Returns:
      ``(H, W, channels)`` int32 raw (unscaled) samples.
    """
    W, H = size
    volume = depth * channels
    delay = (volume + 7) >> 3
    passes, total = pass_geometry(size, volume)
    del total
    grid = jnp.zeros((H, W, channels), jnp.int32)
    for z, sub_x, sub_y, pitch, offset in passes:
        (bx, by), (sx, sy) = ADAM7[z]
        rows = jax.lax.dynamic_slice(
            flat, (offset,), (sub_y * (pitch + 1),)).reshape(
            sub_y, pitch + 1)
        data = defilter(rows, delay)
        samples = samples_from_rows(data, depth, channels, sub_x)
        ys = by + jnp.arange(sub_y) * sy
        xs = bx + jnp.arange(sub_x) * sx
        grid = grid.at[ys[:, None], xs[None, :]].set(samples)
    return grid
