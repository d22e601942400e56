"""Native C++ engine vs. the Python tier and stdlib zlib."""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _sample(n, seed=0, alphabet=48):
    rng = np.random.default_rng(seed)
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
@pytest.mark.parametrize("n", [0, 1, 2, 3, 40, 5000, 120000])
def test_inflate_stdlib_streams(level, n):
    data = _sample(n, seed=level + n)
    comp = zlib.compress(data, level)
    assert native.inflate(comp, n, "zlib") == data


@pytest.mark.parametrize("level", [0, 2, 5, 7, 9, 13])
def test_deflate_roundtrip_stdlib(level):
    data = _sample(60000, seed=level)
    ours = native.deflate(data, level, "zlib")
    assert zlib.decompress(ours) == data


def test_deflate_roundtrip_own_inflate():
    data = _sample(30000, seed=9)
    for fmt in ("zlib", "ios", "gzip"):
        comp = native.deflate(data, 6, fmt)
        assert native.inflate(comp, len(data), fmt) == data


def test_gzip_interop():
    import gzip as gz
    data = _sample(10000, seed=3)
    assert gz.decompress(native.deflate(data, 9, "gzip")) == data
    assert native.inflate(gz.compress(data, 7), len(data), "gzip") == data


def test_checksums_match():
    data = _sample(100000, seed=1, alphabet=256)
    assert native.crc32(data) == zlib.crc32(data)
    assert native.adler32(data) == zlib.adler32(data)
    # streaming state continuation
    a = native.adler32(data[:5000])
    assert native.adler32(data[5000:], a) == zlib.adler32(data)
    c = native.crc32(data[:5000])
    assert native.crc32(data[5000:], c) == zlib.crc32(data)


def test_defilter_matches_host():
    from swift_png_tpu.ops.unfilter import defilter_reference

    rng = np.random.default_rng(5)
    for bpp in (1, 3, 4, 8):
        rows = rng.integers(0, 256, (16, 1 + 24 * bpp), dtype=np.uint8)
        rows[:, 0] = rng.integers(0, 5, 16, dtype=np.uint8)
        want = defilter_reference(rows, bpp)
        got = native.defilter(rows.copy(), bpp)
        np.testing.assert_array_equal(got, want)


def test_filter_select_matches_host():
    from swift_png_tpu.png.encoder import filter_select as host_select

    rng = np.random.default_rng(6)
    for bpp in (1, 4):
        rows = rng.integers(0, 256, (12, 20 * bpp), dtype=np.uint8)
        got = native.filter_select(rows, bpp)
        prev = np.zeros(rows.shape[1], np.uint8)
        for y in range(12):
            want = host_select(rows[y], prev, bpp)
            np.testing.assert_array_equal(got[y], want, err_msg=f"row {y}")
            prev = rows[y]


def test_error_codes():
    data = _sample(500, seed=7)
    comp = bytearray(zlib.compress(data, 6))
    comp[-1] ^= 0xFF
    with pytest.raises(native.NativeError):
        native.inflate(bytes(comp), len(data), "zlib")
    with pytest.raises(native.NativeError):
        native.inflate(b"\x00\x01\x02\x03\x04\x05\x06\x07", 10, "zlib")


def test_sizes_reasonable_vs_stdlib():
    # photographic-ish filtered scanlines: our level 9 should be within a
    # few percent of stdlib's level 9
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:128, 0:128]
    base = (128 + 60 * np.sin(x / 37.0) + 50 * np.cos(y / 23.0))[..., None]
    img = np.clip(base + rng.normal(0, 12, (128, 128, 3)), 0,
                  255).astype(np.uint8)
    rows = img.reshape(128, -1)
    filtered = native.filter_select(rows, 3)
    data = filtered.tobytes()
    ours = len(native.deflate(data, 9, "zlib"))
    ref = len(zlib.compress(data, 9))
    assert ours < ref * 1.05, (ours, ref)


def test_inflate_batch_threaded():
    datas = [_sample(20000, seed=i, alphabet=200) for i in range(6)]
    comps = [zlib.compress(d, 6) for d in datas]
    out = native.inflate_batch(comps, [len(d) for d in datas], threads=4)
    assert out == datas
    # error in one stream surfaces
    bad = list(comps)
    bad[3] = bad[3][:-3]
    with pytest.raises(native.NativeError):
        native.inflate_batch(bad, [len(d) for d in datas])


def test_defilter_batch_threaded():
    from swift_png_tpu.ops.unfilter import defilter_reference

    rng = np.random.default_rng(7)
    rows = rng.integers(0, 256, (5, 12, 1 + 48), dtype=np.uint8)
    rows[:, :, 0] = rng.integers(0, 5, (5, 12), dtype=np.uint8)
    want = [defilter_reference(rows[i], 3) for i in range(5)]
    got = native.defilter_batch(rows.copy(), 3, threads=2)
    for i in range(5):
        np.testing.assert_array_equal(got[i], want[i])


def test_deflate_exponent_window():
    import zlib
    native = pytest.importorskip("swift_png_tpu.native")
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(9)
    chunk = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    data = chunk + b"\x00" * 5000 + chunk  # match at distance ~8000
    for e in (10, 12, 15):
        s = native.deflate(data, 6, "zlib", exponent=e)
        # header declares the requested window
        assert s[0] >> 4 == e - 8
        # a decoder with only 2^e window must accept it
        assert zlib.decompress(s, wbits=e) == data
    # small window must be bigger output (no distance-8000 match)
    s10 = native.deflate(data, 6, "zlib", exponent=10)
    s15 = native.deflate(data, 6, "zlib", exponent=15)
    assert len(s15) < len(s10)


def test_deflate_full_window_distance():
    # regression: the searcher rejected the last legal distances
    # (32767/32768); a match exactly 32768 back must round-trip
    import zlib
    native = pytest.importorskip("swift_png_tpu.native")
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(10)
    block = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
    filler = rng.integers(0, 256, 32768 - 300, dtype=np.uint8).tobytes()
    data = block + filler + block
    s = native.deflate(data, 9, "zlib")
    assert zlib.decompress(s) == data
