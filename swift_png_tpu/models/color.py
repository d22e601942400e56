"""The color-target protocol and the shared convolve/deconvolve machinery.

Counterpart of ``PNG.convolve``/``PNG.deconvolve``
(``Sources/PNG/PNG.swift:149-1284``): big-endian atom loads, depth rescale by
quantum multiply or shift, palette dereference — all as numpy array ops.
"""

from __future__ import annotations

import numpy as np


def quantum(source_depth: int, dest_bits: int) -> int:
    """(2^dest − 1) / (2^source − 1) — exact for PNG depths
    (``PNG.quantum``, ``PNG.swift:257-262``)."""
    return ((1 << dest_bits) - 1) // ((1 << source_depth) - 1)


def samples_from_storage(storage: np.ndarray, kind: str, channels: int) -> np.ndarray:
    """Raw samples from image storage: uint8 view or big-endian uint16 view,
    shape (pixels, channels)."""
    if kind.endswith("16"):
        atoms = storage.reshape(-1, 2)
        samples = (atoms[:, 0].astype(np.uint16) << 8) | atoms[:, 1]
        return samples.reshape(-1, channels)
    return storage.reshape(-1, channels)


def rescale(samples: np.ndarray, source_depth: int, dest_bits: int) -> np.ndarray:
    """Depth rescale (``PNG.convolve(_:of:depth:)``, ``PNG.swift:495-693``)."""
    dtype = np.uint8 if dest_bits == 8 else np.uint16
    if dest_bits == source_depth:
        return samples.astype(dtype)
    if dest_bits > source_depth:
        q = quantum(source_depth, dest_bits)
        return (samples.astype(np.uint32) * q).astype(dtype)
    return (samples >> (source_depth - dest_bits)).astype(dtype)


def descale(values: np.ndarray, source_bits: int, dest_depth: int) -> np.ndarray:
    """Inverse rescale for packing (``PNG.deconvolve``,
    ``PNG.swift:1064-1284``)."""
    if dest_depth == source_bits:
        return values.astype(np.uint16)
    if dest_depth < source_bits:
        return (values >> (source_bits - dest_depth)).astype(np.uint16)
    q = quantum(source_bits, dest_depth)
    return (values.astype(np.uint32) * q).astype(np.uint16)


def samples_to_storage(samples: np.ndarray, kind: str) -> np.ndarray:
    """Samples (pixels, channels) uint16 → flat storage bytes."""
    if kind.endswith("16"):
        flat = samples.reshape(-1)
        out = np.empty(flat.size * 2, np.uint8)
        out[0::2] = (flat >> 8).astype(np.uint8)
        out[1::2] = (flat & 0xFF).astype(np.uint8)
        return out
    return samples.astype(np.uint8).reshape(-1)


def deconvolve_samples(values: np.ndarray, kind: str, depth: int) -> np.ndarray:
    """values (pixels, channels) in target precision → storage bytes."""
    bits = 8 if values.dtype == np.uint8 else 16
    return samples_to_storage(descale(values, bits, depth), kind)


class ColorTarget:
    """Protocol shape of ``PNG.Color`` (``PNG.Color.swift:13-155``): a target
    provides ``unpack(storage, format, size)`` and ``pack(pixels, format)``.
    Custom targets subclass this."""

    def unpack(self, storage, format, size):  # pragma: no cover - interface
        raise NotImplementedError

    def pack(self, pixels, format):  # pragma: no cover - interface
        raise NotImplementedError
