"""Color targets: vectorized pixel packing/unpacking.

Behavioral counterpart of ``Sources/PNG/ColorTargets/``: the ``PNG.Color``
protocol (``PNG.Color.swift:13-155``), ``PNG.RGBA`` (``PNG.RGBA.swift``) and
``PNG.VA`` (``PNG.VA.swift``), plus the exact integer ``premultiply`` /
``straighten`` operations (``PNG.swift:54-117``).

Unlike the reference's array-of-structs, targets here produce numpy arrays of
shape (y, x, channels) — the natural layout for the TPU convolve kernels in
:mod:`swift_png_tpu.ops.convolve`.
"""

from __future__ import annotations

import numpy as np

from .color import ColorTarget, deconvolve_samples, samples_from_storage
from .rgba import RGBA
from .v import V
from .va import VA

__all__ = ["RGBA", "V", "VA", "ColorTarget", "premultiply", "straighten",
           "samples_from_storage", "deconvolve_samples"]


def premultiply(color: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Exact integer premultiplication (``PNG.premultiply``,
    ``PNG.swift:54-68``): ``(color·alpha + max//2) // max``."""
    tmax = np.iinfo(color.dtype).max
    product = color.astype(np.uint64) * alpha.astype(np.uint64) + (tmax >> 1)
    return (product // tmax).astype(color.dtype)


def straighten(premultiplied: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Exact integer straightening (``PNG.straighten``,
    ``PNG.swift:101-117``); returns the input where ``alpha`` is zero."""
    tmax = np.iinfo(premultiplied.dtype).max
    a = alpha.astype(np.uint64)
    product = np.uint64(tmax) * premultiplied.astype(np.uint64) + (a >> 1)
    safe = np.maximum(a, 1)
    out = (product // safe).astype(premultiplied.dtype)
    return np.where(alpha == 0, premultiplied, out)
