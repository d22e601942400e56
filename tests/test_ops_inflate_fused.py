"""Single-call fused device inflate vs. stdlib zlib and the host engine."""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.lz77 import Deflator
from swift_png_tpu.lz77.errors import DecompressionError
from swift_png_tpu.ops.inflate_fused import InflateFused


def _sample(n, seed=0, alphabet=16):
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


ENGINE = InflateFused(win_bytes=1 << 14, t_max=1 << 12)


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("n", [1, 40, 5000, 70000])
def test_matches_stdlib_zlib(level, n):
    data = _sample(n, seed=level * 100 + n)
    comp = zlib.compress(data, level)
    out = ENGINE.inflate(comp, len(data), "zlib")
    assert bytes(out) == data


def test_fixed_blocks():
    data = _sample(3000, seed=7)
    co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
    comp = co.compress(data) + co.flush()
    assert bytes(ENGINE.inflate(comp, len(data), "zlib")) == data


def test_own_deflater_multi_block():
    data = _sample(60000, seed=3)
    for level in (0, 5, 9):
        d = Deflator("zlib", level=level)
        d.push(data, last=True)
        out = ENGINE.inflate(d.pull(), len(data), "zlib")
        assert bytes(out) == data, f"level {level}"


def test_overlapping_and_deep_chains():
    data = b"a" * 100000 + b"bc" * 300 + b"a" * 50
    comp = zlib.compress(data, 9)
    assert bytes(ENGINE.inflate(comp, len(data), "zlib")) == data


def test_mixed_stored_blocks():
    data = _sample(200000, seed=4, alphabet=256)
    comp = zlib.compress(data, 0)
    assert bytes(ENGINE.inflate(comp, len(data), "zlib")) == data


def test_ios_headerless():
    data = _sample(800, seed=9)
    comp = zlib.compress(data, 6)
    assert bytes(ENGINE.inflate(comp[2:-4], len(data), "ios")) == data


def test_budget_growth_retry():
    # a block larger than the initial 16 KB window forces a retry
    data = bytes(np.random.default_rng(0).integers(0, 256, 120000,
                                                   dtype=np.uint8))
    comp = zlib.compress(data, 1)
    eng = InflateFused(win_bytes=1 << 13, t_max=1 << 11)
    assert bytes(eng.inflate(comp, len(data), "zlib")) == data


def test_bad_checksum_raises():
    data = _sample(500, seed=5)
    comp = bytearray(zlib.compress(data, 6))
    comp[-1] ^= 0xFF
    with pytest.raises(DecompressionError):
        ENGINE.inflate(bytes(comp), len(data), "zlib")


def test_png_idat_streams():
    import glob
    import os
    corpus = os.path.join(conftest.REFERENCE,
                          "Sources/PNGIntegrationTests/Inputs/Common")
    if not os.path.isdir(corpus):
        pytest.skip("reference corpus unavailable")
    from swift_png_tpu.png.chunk import ByteSource
    from swift_png_tpu.lz77 import Inflator

    for path in sorted(glob.glob(os.path.join(corpus, "bas*.png")))[:8]:
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
        got = ENGINE.inflate(bytes(idat), len(want), "zlib")
        assert bytes(got) == want, path


def test_repeat16_after_zero_run():
    """A 16 (repeat-previous) after a 17/18 zero-run must repeat 0 —
    zlib's ``lens[have-1]`` semantics, not the last explicit length."""
    from swift_png_tpu.utils.bits import BitWriter, reverse_bits
    from swift_png_tpu.lz77.checksums import adler32
    from swift_png_tpu.lz77 import Inflator

    out = BitWriter()
    out.write_bytes(bytes([0x78, 0x9C]))  # zlib header (32K window)
    out.write(1, 1)  # final
    out.write(2, 2)  # dynamic
    # lit tree: sym0 len1, 255 zeros, sym256 len1  (hlit=257, hdist=1)
    out.write(0, 5)   # HLIT - 257
    out.write(0, 5)   # HDIST - 1
    # meta tree: codes for {16,17,18} len 2 and {0,1} len 3
    # (Kraft: 3·2⁻² + 2·2⁻³ = 1).  Canonical: 16→00 17→01 18→10 0→110 1→111
    # order: 16 17 18 0 8 7 9 6 10 5 11 4 12 3 13 2 14 1 15 → transmit
    # through index of symbol 1 (position 17) → HCLEN = 18
    out.write(18 - 4, 4)
    order = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1]
    meta_len = {0: 3, 1: 3, 16: 2, 17: 2, 18: 2}
    for s in order:
        out.write(meta_len.get(s, 0), 3)
    code = {16: (0b00, 2), 17: (0b01, 2), 18: (0b10, 2),
            0: (0b110, 3), 1: (0b111, 3)}

    def meta(sym, extra=None, ebits=0):
        c, ln = code[sym]
        out.write(reverse_bits(c, ln), ln)
        if extra is not None:
            out.write(extra, ebits)

    # code-length sequence for 257 lit + 1 dist lengths:
    # [1] + 138×0 (18) + 105×0 (18) + 6×0 (17) + 3×0 (16 ← repeats 0!)
    # + 3×0 (17) + [1 @ sym256] + [0 dist]
    meta(1)
    meta(18, 138 - 11, 7)
    meta(18, 105 - 11, 7)
    meta(17, 6 - 3, 3)
    meta(16, 3 - 3, 2)
    meta(17, 3 - 3, 3)
    meta(1)
    meta(0)
    # body: lit tree has sym0→code 0, sym256→code 1 (1-bit canonical)
    for _ in range(5):
        out.write(0, 1)  # five sym0 literals
    out.write(1, 1)      # EOB (code 1)
    out.pad_to_byte()
    payload = bytes(out.drain()) + adler32(b"\x00" * 5).to_bytes(4, "big")

    host = Inflator("zlib")
    host.push(payload)
    want = host.pull()
    assert want == b"\x00" * 5 and host.terminal
    got = ENGINE.inflate(payload, 5, "zlib")
    assert bytes(got) == want


def test_gzip_container():
    import gzip as gz
    data = _sample(12000, seed=11)
    comp = gz.compress(data, 7)
    assert bytes(ENGINE.inflate(comp, len(data), "gzip")) == data
    # our native gzip output too
    from swift_png_tpu import native
    if native.available():
        comp2 = native.deflate(data, 6, "gzip")
        assert bytes(ENGINE.inflate(comp2, len(data), "gzip")) == data
    # corrupted crc raises
    bad = bytearray(comp)
    bad[-5] ^= 0xFF
    with pytest.raises(DecompressionError):
        ENGINE.inflate(bytes(bad), len(data), "gzip")


def test_short_zlib_input_typed_error():
    from swift_png_tpu.lz77.errors import DecompressionError
    eng = InflateFused()
    with pytest.raises(DecompressionError):
        eng.inflate(b"\x78", out_size=0, format="zlib")
    with pytest.raises(DecompressionError):
        eng.inflate(b"", out_size=0, format="zlib")


def test_hlit_overflow_rejected():
    # hlit = 287 (> RFC 1951 max 286) must be rejected up front like the
    # host and native engines, not only if symbol 286/287 appears
    from swift_png_tpu.lz77.errors import DecompressionError
    from swift_png_tpu.utils.bits import BitWriter

    bw = BitWriter()
    bw.write(1, 1)   # final
    bw.write(2, 2)   # dynamic
    bw.write(30, 5)  # hlit = 287
    bw.write(0, 5)   # hdist = 1
    bw.write(15, 4)  # hclen = 19
    for _ in range(19):
        bw.write(1, 3)  # all meta code lengths = 1 (invalid tree too)
    bw.pad_to_byte()
    body = bytes(bw.drain()) + b"\x00" * 64
    eng = InflateFused()
    with pytest.raises(DecompressionError):
        eng.run(body, 4)


def test_run_batch_large_single_block():
    # regression: run_batch used fixed retry ceilings instead of scaling
    # with the stream like run(); a single large block must still decode
    rng = np.random.default_rng(3)
    base = rng.integers(0, 64, 1 << 18, dtype=np.uint8).tobytes()
    d = Deflator(level=4)
    d.push(base, last=True)
    stream = d.pull()
    from swift_png_tpu.ops.inflate_fused import InflateFusedBatch

    eng = InflateFusedBatch(win_bytes=1 << 12, t_max=1 << 10)
    out = eng.inflate_batch([stream, stream], len(base),
                            keep_on_device=False)
    assert bytes(np.asarray(out[0])) == base
    assert bytes(np.asarray(out[1])) == base
