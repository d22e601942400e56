"""PngSuite integration tests.

Counterpart of ``Sources/PNGIntegrationTests/Roundtripping.swift``:
decode every corpus file and compare pixel-exact against the little-endian
RGBA16 golden dumps (``:166-236``); re-encode a sample and re-verify
(``:241-268``); iOS inputs compare against 8-bit-premultiplied goldens
(``:208-211``).
"""

import os
import random

import numpy as np
import pytest

from swift_png_tpu import png
from swift_png_tpu.models import RGBA

BASE = "/root/reference/Sources/PNGIntegrationTests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference corpus unavailable")


def _golden(name: str, shape) -> np.ndarray:
    raw = open(f"{BASE}/RGBA/{name}.rgba", "rb").read()
    return np.frombuffer(raw, np.dtype("<u2")).reshape(shape)


def _common_files():
    if not os.path.isdir(BASE):
        return []
    return sorted(os.listdir(f"{BASE}/Inputs/Common"))


@pytest.mark.parametrize("name", _common_files())
def test_decode_bit_exact(name):
    img = png.Image.decompress_path(f"{BASE}/Inputs/Common/{name}")
    rgba = img.unpack_rgba16()
    assert np.array_equal(rgba, _golden(name, rgba.shape))


def _ios_files():
    if not os.path.isdir(BASE):
        return []
    return sorted(os.listdir(f"{BASE}/Inputs/iOS"))


@pytest.mark.parametrize("name", _ios_files())
def test_decode_ios_bit_exact(name):
    img = png.Image.decompress_path(f"{BASE}/Inputs/iOS/{name}")
    rgba = img.unpack_rgba16()
    gold = _golden(name, rgba.shape).astype(np.uint16)
    premultiplied = RGBA.of16.premultiplied(gold, as_bits=8)
    assert np.array_equal(rgba, premultiplied)


def _roundtrip_sample():
    files = _common_files()
    if not files:
        return []
    rng = random.Random(42)
    return rng.sample(files, 12)


@pytest.mark.parametrize("name", _roundtrip_sample())
def test_encode_roundtrip(name):
    img = png.Image.decompress_path(f"{BASE}/Inputs/Common/{name}")
    gold = _golden(name, img.unpack_rgba16().shape)
    out = img.compress_bytes(level=4)
    again = png.Image.decompress_bytes(out)
    assert np.array_equal(again.unpack_rgba16(), gold)


def test_encode_roundtrip_interlaced_high_level():
    name = "basi2c08.png"
    img = png.Image.decompress_path(f"{BASE}/Inputs/Common/{name}")
    gold = _golden(name, img.unpack_rgba16().shape)
    out = img.compress_bytes(level=9)
    again = png.Image.decompress_bytes(out)
    assert again.layout.interlaced
    assert np.array_equal(again.unpack_rgba16(), gold)


def test_encode_roundtrip_ios():
    name = "basn6a08.png"
    img = png.Image.decompress_path(f"{BASE}/Inputs/iOS/{name}")
    rgba = img.unpack_rgba16()
    out = img.compress_bytes(level=7)
    again = png.Image.decompress_bytes(out)
    assert again.layout.format.kind == "bgra8"
    assert np.array_equal(again.unpack_rgba16(), rgba)
    # CgBI chunk leads the stream
    assert out[8:16][4:8] == b"CgBI"


INVALID_EXPECTATIONS = {
    "xs1n0g01": ("LexingError", None),
    "xs2n0g01": ("LexingError", None),
    "xs4n0g01": ("LexingError", None),
    "xs7n0g01": ("LexingError", None),
    "xcrn0g04": ("LexingError", None),
    "xlfn0g04": ("LexingError", None),
    "xhdn0g08": ("LexingError", "invalidChunkChecksum"),
    "xcsn0g01": ("LexingError", "invalidChunkChecksum"),
    "xc1n0g08": ("ParsingError", "invalidHeaderPixelFormatCode"),
    "xc9n2c08": ("ParsingError", "invalidHeaderPixelFormatCode"),
    "xd0n2c08": ("ParsingError", "invalidHeaderPixelFormatCode"),
    "xd3n2c08": ("ParsingError", "invalidHeaderPixelFormatCode"),
    "xd9n2c08": ("ParsingError", "invalidHeaderPixelFormatCode"),
    "xdtn0g01": ("DecodingError", "required"),
}


@pytest.mark.parametrize("name,expected", sorted(INVALID_EXPECTATIONS.items()))
def test_invalid_files(name, expected):
    """Counterpart of ``ErrorHandling.swift:6-90``: exact error cases."""
    etype, case = expected
    with pytest.raises(png.PNGError) as err:
        png.Image.decompress_path(f"{BASE}/Inputs/Invalid/{name}.png")
    assert type(err.value).__name__ == etype
    if case is not None:
        assert err.value.case == case


def test_invalid_checksum_values():
    """The declared/computed CRC values match the reference's assertions
    (``ErrorHandling.swift:24-45``)."""
    with pytest.raises(png.LexingError) as err:
        png.Image.decompress_path(f"{BASE}/Inputs/Invalid/xhdn0g08.png")
    assert err.value.details == {"declared": 1129534797, "computed": 1443964200}
    with pytest.raises(png.LexingError) as err:
        png.Image.decompress_path(f"{BASE}/Inputs/Invalid/xcsn0g01.png")
    assert err.value.details == {"declared": 1129534797, "computed": 3492746441}
