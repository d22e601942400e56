"""Full-corpus re-encode: every PngSuite file at levels 4, 7, and 10, and
every iOS file at level 13 — the reference's complete encode matrix
(``Sources/PNGIntegrationTests/Roundtripping.swift:241-268``)."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import native, png
from swift_png_tpu.models.rgba import RGBA

BASE = "/root/reference/Sources/PNGIntegrationTests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference corpus unavailable")


def _files(sub):
    d = f"{BASE}/Inputs/{sub}"
    return sorted(f for f in os.listdir(d) if f.endswith(".png")) if (
        os.path.isdir(d)) else []


def _golden(name, shape):
    path = f"{BASE}/RGBA/{name}.rgba"
    raw = np.fromfile(path, np.uint8)
    return raw.view("<u2").reshape(shape)


@pytest.mark.skipif(not native.available(), reason="native engine required")
@pytest.mark.parametrize("name", _files("Common"))
def test_reencode_all_levels(name):
    img = png.Image.decompress_path(f"{BASE}/Inputs/Common/{name}")
    gold = _golden(name, img.unpack_rgba16().shape)
    for level in (4, 7, 10):
        out = img.compress_bytes(level=level)
        again = png.Image.decompress_bytes(out)
        assert np.array_equal(again.unpack_rgba16(), gold), (name, level)


@pytest.mark.skipif(not native.available(), reason="native engine required")
@pytest.mark.parametrize("name", _files("iOS"))
def test_reencode_ios_level13(name):
    img = png.Image.decompress_path(f"{BASE}/Inputs/iOS/{name}")
    want = img.unpack_rgba16()
    out = img.compress_bytes(level=13)
    again = png.Image.decompress_bytes(out)
    assert np.array_equal(again.unpack_rgba16(), want), name
