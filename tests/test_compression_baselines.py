"""Compression regression over the reference's 28 baseline images.

Counterpart of ``Sources/PNGCompressionTests/Compression.swift:6-85``:
re-encode each GIMP zlib-9 baseline at level 9, assert pixel-exact
round-trip, and report the size ratio (informational in the reference; we
additionally assert the median stays within a sane bound of the baseline).
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import native, png

BASE = "/root/reference/Tests/Baselines"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference baselines unavailable")


def _names():
    return sorted(os.listdir(BASE)) if os.path.isdir(BASE) else []


@pytest.mark.parametrize("name", _names())
def test_reencode_level9_roundtrip(name):
    path = os.path.join(BASE, name)
    img = png.Image.decompress_path(path)
    want = img.unpack_rgba16()
    encoded = img.compress_bytes(level=9)
    back = png.Image.decompress_bytes(encoded)
    assert np.array_equal(back.unpack_rgba16(), want)


def test_size_ratios_vs_baseline():
    if not native.available():
        pytest.skip("native engine required for level-9 timing")
    ratios = []
    for name in _names():
        path = os.path.join(BASE, name)
        baseline = os.path.getsize(path)
        img = png.Image.decompress_path(path)
        ours = len(img.compress_bytes(level=9))
        ratios.append(ours / baseline)
    ratios.sort()
    median = ratios[len(ratios) // 2]
    print(f"\nlevel-9 size vs GIMP-zlib9 baseline: median "
          f"{median:.4f}, min {ratios[0]:.4f}, max {ratios[-1]:.4f}")
    assert median < 1.10, ratios
