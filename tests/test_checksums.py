"""Adler-32 / CRC-32 vs the independent stdlib implementation, plus the
parallel combine operators that power sharded checksumming."""

import os
import zlib

import numpy as np
import pytest

from swift_png_tpu.lz77.checksums import adler32, adler32_combine, crc32, crc32_combine


@pytest.mark.parametrize("n", [0, 1, 3, 100, 5551, 5552, 5553, 70000])
def test_against_zlib(n):
    data = os.urandom(n)
    assert adler32(data) == zlib.adler32(data)
    assert crc32(data) == zlib.crc32(data)


def test_streaming_continuation():
    a, b = os.urandom(1234), os.urandom(777)
    assert adler32(b, adler32(a)) == zlib.adler32(a + b)
    assert crc32(b, crc32(a)) == zlib.crc32(a + b)


@pytest.mark.parametrize("na,nb", [(0, 10), (10, 0), (1234, 4321), (5552, 5552)])
def test_combine(na, nb):
    a, b = os.urandom(na), os.urandom(nb)
    assert adler32_combine(adler32(a), adler32(b), nb) == zlib.adler32(a + b)
    assert crc32_combine(crc32(a), crc32(b), nb) == zlib.crc32(a + b)


def test_numpy_input():
    arr = np.arange(1000, dtype=np.uint8)
    assert adler32(arr) == zlib.adler32(arr.tobytes())
    assert crc32(arr) == zlib.crc32(arr.tobytes())
