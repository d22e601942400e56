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
    # the reference's own level 9 lands at ~0.98 of libpng@9; hold the
    # line at 0.99 of the GIMP baselines (measured 0.978 in round 1)
    assert median <= 0.99, ratios


GOLDENS = os.path.join(os.path.dirname(__file__), "data",
                       "compression_goldens.json")


def test_per_level_sizes_no_regression():
    """Committed per-level (0-13) size goldens for every baseline: the
    encoder must never regress a level between rounds (goldens are only
    updated intentionally when a change improves sizes)."""
    import json

    if not native.available():
        pytest.skip("native engine required")
    if not os.path.exists(GOLDENS):
        pytest.skip("goldens not generated")
    goldens = json.load(open(GOLDENS))
    bad = []
    for name in _names():
        img = png.Image.decompress_path(os.path.join(BASE, name))
        for level in range(14):
            got = len(img.compress_bytes(level=level))
            want = goldens[name][str(level)]
            if got > want:
                bad.append((name, level, got, want))
    assert not bad, bad[:10]


def test_level9_vs_stdlib_zlib_yardstick():
    """External yardstick (BASELINE.md analog): our level-9 zlib body on
    the filtered scanlines must stay within 2 % of stdlib zlib -9 on the
    same bytes (the reference beats libpng@9 by ~2 %)."""
    import zlib as _z

    if not native.available():
        pytest.skip("native engine required")
    ratios = []
    for name in _names()[:10]:
        img = png.Image.decompress_path(os.path.join(BASE, name))
        W, H = img.size
        storage = bytes(img.storage)
        bpp = max(1, len(storage) // (W * H))
        rows = np.frombuffer(storage, np.uint8)[:H * W * bpp].reshape(
            H, W * bpp)
        filt = native.filter_select(rows, bpp).tobytes()
        ours = len(native.deflate(filt, 9, "zlib"))
        std = len(_z.compress(filt, 9))
        ratios.append(ours / std)
    ratios.sort()
    median = ratios[len(ratios) // 2]
    print(f"\nlevel-9 vs stdlib zlib-9 on filtered rows: median "
          f"{median:.4f}, worst {ratios[-1]:.4f}")
    assert median <= 1.02, ratios
