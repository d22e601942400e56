"""Scanline decode pipeline: inflate → defilter → delegate.

Behavioral counterpart of ``PNG.Decoder``
(``Sources/PNG/Decoding/PNG.Decoder.swift``): Adam7 pass table (``:5-15``),
resumable (row, pass) cursor (``:17-26``), scanline loop (``:47-149``) and
``defilter`` (``:152-196``).

The host defilter is numpy-vectorized where the filter allows (None/Up fully,
Sub via per-lane modular cumsum); Average/Paeth carry a sequential intra-row
dependency here and are reformulated as scan kernels in
:mod:`swift_png_tpu.ops.unfilter` for the TPU path.
"""

from __future__ import annotations

import numpy as np

from ..lz77 import Inflator
from .errors import DecodingError
from .format import IOS

#: Adam7 pass table: (base, stride) per pass — equivalent to the reference's
#: (base, exponent) table (``PNG.Decoder.swift:5-15``)
ADAM7 = [
    ((0, 0), (8, 8)),
    ((4, 0), (8, 8)),
    ((0, 4), (4, 8)),
    ((2, 0), (4, 4)),
    ((0, 2), (2, 4)),
    ((1, 0), (2, 2)),
    ((0, 1), (1, 2)),
]


def adam7_subimage(size: tuple[int, int], z: int) -> tuple[int, int]:
    (bx, by), (sx, sy) = ADAM7[z]
    return ((size[0] + sx - bx - 1) // sx, (size[1] + sy - by - 1) // sy)


def paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (``PNG.paeth``, ``PNG.swift:123-147``)."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def defilter(line: np.ndarray, last: np.ndarray, delay: int) -> np.ndarray:
    """Reverse one scanline's filter in place; ``line[0]`` is the filter byte.

    (``PNG.Decoder.defilter``, ``PNG.Decoder.swift:152-196``.)
    """
    ftype = int(line[0])
    cur = line[1:]
    prev = last[1:]
    n = cur.size
    if ftype == 0 or n == 0:
        return line
    if ftype == 1:  # sub: per-lane modular prefix sum
        pad = (-n) % delay
        lanes = (
            np.concatenate([cur, np.zeros(pad, np.uint8)])
            .reshape(-1, delay)
            .astype(np.int64)
        )
        summed = np.cumsum(lanes, axis=0) & 0xFF
        cur[:] = summed.astype(np.uint8).reshape(-1)[:n]
    elif ftype == 2:  # up
        cur += prev  # uint8 wraparound
    elif ftype == 3:  # average
        c = cur.astype(np.int32)
        p = prev.astype(np.int32)
        out = np.empty(n, np.int32)
        out[:delay] = (c[:delay] + (p[:delay] >> 1)) & 0xFF
        for i in range(delay, n):
            out[i] = (c[i] + ((out[i - delay] + p[i]) >> 1)) & 0xFF
        cur[:] = out.astype(np.uint8)
    elif ftype == 4:  # paeth
        c = cur.astype(np.int32)
        p = prev.astype(np.int32)
        out = np.empty(n, np.int32)
        for i in range(delay):
            # a = 0, c = 0 ⇒ predictor is b
            out[i] = (c[i] + p[i]) & 0xFF
        for i in range(delay, n):
            a = out[i - delay]
            b = p[i]
            cc = p[i - delay]
            pa = abs(b - cc)
            pb = abs(a - cc)
            pc = abs(a + b - 2 * cc)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = cc
            out[i] = (c[i] + pred) & 0xFF
        cur[:] = out.astype(np.uint8)
    # invalid filter types pass through unchanged, like the reference
    return line


class Decoder:
    """Per-image decode state (``PNG.Decoder``)."""

    def __init__(self, standard: str, interlaced: bool):
        self.row: tuple[int, np.ndarray] | None = None
        self.pass_: int | None = 0 if interlaced else None
        self.continue_ = True
        self.inflator = Inflator("ios" if standard == IOS else "zlib")

    def push(self, data: bytes, size: tuple[int, int], pixel, delegate) -> bool:
        """Feed one IDAT chunk's bytes; calls ``delegate(scanline, base,
        stride)`` per completed row.  Returns whether more compressed data is
        expected (the reference's ``continue`` token)."""
        if not self.continue_:
            raise DecodingError.extraneous_compressed_data()
        self.inflator.push(data)
        if self.inflator.terminal:
            self.continue_ = False

        delay = (pixel.volume + 7) >> 3
        if self.pass_ is not None:
            for z in range(self.pass_, 7):
                (bx, by), (sx, sy) = ADAM7[z]
                sub_x, sub_y = adam7_subimage(size, z)
                if sub_x <= 0 or sub_y <= 0:
                    continue
                pitch = (sub_x * pixel.volume + 7) >> 3
                if self.row is not None:
                    start, last = self.row
                else:
                    start, last = 0, np.zeros(pitch + 1, np.uint8)
                self.row = None
                for y in range(start, sub_y):
                    raw = self.inflator.pull(pitch + 1)
                    if raw is None:
                        self.row = (y, last)
                        self.pass_ = z
                        return self.continue_
                    scanline = np.frombuffer(raw, np.uint8).copy()
                    defilter(scanline, last, delay)
                    delegate(scanline[1:], (bx, by + y * sy), (sx, sy))
                    last = scanline
        else:
            pitch = (size[0] * pixel.volume + 7) >> 3
            if self.row is not None:
                start, last = self.row
            else:
                start, last = 0, np.zeros(pitch + 1, np.uint8)
            self.row = None
            for y in range(start, size[1]):
                raw = self.inflator.pull(pitch + 1)
                if raw is None:
                    self.row = (y, last)
                    return self.continue_
                scanline = np.frombuffer(raw, np.uint8).copy()
                defilter(scanline, last, delay)
                delegate(scanline[1:], (0, y), (1, 1))
                last = scanline

        self.pass_ = 7
        if self.inflator.pull():
            raise DecodingError.extraneous_image_data()
        return self.continue_
