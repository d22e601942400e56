"""Device parallel inflate vs. stdlib zlib and the host inflator."""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.lz77 import Deflator
from swift_png_tpu.lz77.errors import DecompressionError
from swift_png_tpu.ops import inflate as dev


def _sample(n, seed=0, alphabet=16):
    rng = np.random.default_rng(seed)
    # runs + random: exercises matches, overlaps, literals
    parts = []
    while sum(map(len, parts)) < n:
        if rng.random() < 0.5:
            parts.append(bytes(rng.integers(0, alphabet, rng.integers(1, 64),
                                            dtype=np.uint8)))
        else:
            parts.append(bytes([int(rng.integers(0, alphabet))])
                         * int(rng.integers(3, 200)))
    return b"".join(parts)[:n]


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("n", [1, 40, 5000, 70000])
def test_matches_stdlib_zlib_streams(level, n):
    data = _sample(n, seed=level * 100 + n)
    comp = zlib.compress(data, level)
    out = dev.inflate(comp, len(data), "zlib")
    assert bytes(out) == data


def test_fixed_huffman_blocks():
    data = _sample(3000, seed=7)
    co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
    comp = co.compress(data) + co.flush()
    out = dev.inflate(comp, len(data), "zlib")
    assert bytes(out) == data


def test_own_deflater_streams():
    data = _sample(20000, seed=3)
    for level in (0, 5, 9):
        d = Deflator("zlib", level=level)
        d.push(data, last=True)
        out = dev.inflate(d.pull(), len(data), "zlib")
        assert bytes(out) == data, f"level {level}"


def test_overlapping_copies():
    # dist=1 chains (deep pointer chains for the expansion doubling)
    data = b"a" * 100000 + b"bc" * 300 + b"a" * 50
    comp = zlib.compress(data, 9)
    out = dev.inflate(comp, len(data), "zlib")
    assert bytes(out) == data


def test_ios_headerless():
    data = _sample(800, seed=9)
    comp = zlib.compress(data, 6)
    body = comp[2:-4]  # raw DEFLATE, the CgBI shape
    out = dev.inflate(body, len(data), "ios")
    assert bytes(out) == data


def test_multi_stored_blocks():
    # stored blocks cap at 65535 bytes → forces several
    data = _sample(200000, seed=4, alphabet=256)
    comp = zlib.compress(data, 0)
    out = dev.inflate(comp, len(data), "zlib")
    assert bytes(out) == data


def test_bad_checksum_raises():
    data = _sample(500, seed=5)
    comp = bytearray(zlib.compress(data, 6))
    comp[-1] ^= 0xFF
    with pytest.raises(DecompressionError):
        dev.inflate(bytes(comp), len(data), "zlib")


def test_png_idat_streams_match_host():
    import glob
    import os
    corpus = os.path.join(conftest.REFERENCE,
                          "Sources/PNGIntegrationTests/Inputs/Common")
    if not os.path.isdir(corpus):
        pytest.skip("reference corpus unavailable")
    from swift_png_tpu.png.chunk import ByteSource
    from swift_png_tpu.lz77 import Inflator

    checked = 0
    for path in sorted(glob.glob(os.path.join(corpus, "basn*.png")))[:6]:
        src = ByteSource(open(path, "rb").read())
        src.signature()
        idat = bytearray()
        while True:
            t, payload = src.chunk()
            if t == "IDAT":
                idat += payload
            elif t == "IEND":
                break
        host = Inflator("zlib")
        host.push(bytes(idat))
        want = host.pull()
        got = dev.inflate(bytes(idat), len(want), "zlib")
        assert bytes(got) == want, path
        checked += 1
    assert checked
