"""spIx checkpoint-index chunk: standard-PNG compatibility + the batched
indexed decode pipeline."""

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import native, png
from swift_png_tpu.parallel.batch import decode_indexed


def _image(seed, H=48, W=40):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (H, W, 4), dtype=np.uint8)
    px[..., 3] = 255
    from swift_png_tpu.png.format import Format
    from swift_png_tpu.png.format import Layout

    layout = Layout(Format("rgba8", ()), False)
    return png.Image.pack(px, layout)


@pytest.mark.skipif(not native.available(), reason="native engine required")
def test_spix_roundtrip_and_standard_compat():
    img = _image(0)
    data = img.compress_bytes(level=6, index=True)
    # a standard decoder (ours, ignoring spIx) still decodes bit-exact
    back = png.Image.decompress_bytes(data)
    assert np.array_equal(back.unpack_rgba8(), img.unpack_rgba8())
    # the chunk is present and round-trips through metadata.application
    assert any(t == "spIx" for (t, _) in back.metadata.application)


@pytest.mark.skipif(not native.available(), reason="native engine required")
def test_decode_indexed_batch_bit_exact():
    imgs = [_image(i) for i in range(3)]
    pngs = [im.compress_bytes(level=6, index=True) for im in imgs]
    pixels = decode_indexed(pngs, backend="xla")
    assert pixels is not None
    got = np.asarray(pixels)
    for i, im in enumerate(imgs):
        assert np.array_equal(got[i], im.unpack_rgba8()), i


@pytest.mark.skipif(not native.available(), reason="native engine required")
def test_decode_indexed_falls_back_without_index():
    img = _image(1)
    pngs = [img.compress_bytes(level=6)]  # no index chunk
    assert decode_indexed(pngs) is None


@pytest.mark.skipif(not native.available(), reason="native engine required")
@pytest.mark.parametrize("kind", ["v8", "va16", "rgb16", "indexed8", "v4"])
def test_decode_indexed_wide_formats(kind):
    """The indexed fast path serves every non-interlaced standard
    format: gray/alpha/16-bit, palette, and sub-byte depths."""
    from swift_png_tpu.png.format import Format, Layout

    rng = np.random.default_rng(abs(hash(kind)) % 2**31)
    H, W = 40, 36
    imgs = []
    for seed in range(2):
        if kind == "indexed8":
            pal = tuple(
                (int(r), int(g), int(b), 255)
                for r, g, b in rng.integers(0, 256, (16, 3)))
            fmt = Format("indexed8", pal)
            idx = rng.integers(0, 16, H * W)
            px = np.array([pal[i] for i in idx],
                          np.uint8).reshape(H, W, 4)
        elif kind == "v4":
            fmt = Format(kind, ())
            v = (rng.integers(0, 16, (H, W), dtype=np.uint8) * 17)
            px = np.stack([v, v, v, np.full_like(v, 255)], axis=-1)
        elif kind == "v8":
            fmt = Format(kind, ())
            v = rng.integers(0, 256, (H, W), dtype=np.uint8)
            px = np.stack([v, v, v, np.full_like(v, 255)], axis=-1)
        elif kind == "va16":
            fmt = Format(kind, ())
            v = rng.integers(0, 1 << 16, (H, W), dtype=np.uint16)
            a = rng.integers(0, 1 << 16, (H, W), dtype=np.uint16)
            px = np.stack([v, v, v, a], axis=-1)
        else:  # rgb16
            fmt = Format(kind, ())
            px = rng.integers(0, 1 << 16, (H, W, 4), dtype=np.uint16)
            px[..., 3] = 0xFFFF
        layout = Layout(fmt, False)
        imgs.append(png.Image.pack(px, layout))
    pngs = [im.compress_bytes(level=6, index=True) for im in imgs]
    pixels = decode_indexed(pngs, backend="xla")
    assert pixels is not None, kind
    got = np.asarray(pixels)
    for i, im in enumerate(imgs):
        assert np.array_equal(got[i], im.unpack_rgba8()), (kind, i)


@pytest.mark.skipif(not native.available(), reason="native engine required")
@pytest.mark.parametrize("kind", ["rgba16", "v16", "rgb16"])
def test_decode_indexed_16bit_output(kind):
    """``bits=16`` through the flagship indexed path preserves full
    16-bit precision (``unpack(as: RGBA<UInt16>)``,
    ``PNG.Image.swift:1012``) — round-4 fix for the hardcoded 8-bit
    output."""
    from swift_png_tpu.png.format import Format, Layout

    rng = np.random.default_rng(abs(hash(kind)) % 2**31)
    H, W = 40, 36
    imgs = []
    for seed in range(2):
        if kind == "v16":
            v = rng.integers(0, 1 << 16, (H, W), dtype=np.uint16)
            px = np.stack([v, v, v, np.full_like(v, 0xFFFF)], axis=-1)
        else:
            px = rng.integers(0, 1 << 16, (H, W, 4), dtype=np.uint16)
            if kind == "rgb16":
                px[..., 3] = 0xFFFF
        imgs.append(png.Image.pack(px, Layout(Format(kind, ()), False)))
    pngs = [im.compress_bytes(level=6, index=True) for im in imgs]
    pixels = decode_indexed(pngs, backend="xla", bits=16)
    assert pixels is not None, kind
    got = np.asarray(pixels)
    assert got.dtype == np.uint16
    for i, im in enumerate(imgs):
        assert np.array_equal(got[i], im.unpack_rgba16()), (kind, i)


@pytest.mark.skipif(not native.available(), reason="native engine required")
def test_decode_indexed_pngsuite_sample():
    """Corpus integration for the widened indexed path: a spread of real
    PngSuite images (gray, palette, alpha, 16-bit, sub-byte) re-encoded
    with an spIx index must decode bit-exact through decode_indexed."""
    import os

    import conftest

    base = os.path.join(conftest.REFERENCE,
                        "Sources/PNGIntegrationTests/Inputs/Common")
    if not os.path.isdir(base):
        pytest.skip("reference corpus unavailable")
    names = ["basn0g01", "basn0g04", "basn0g08", "basn0g16", "basn2c08",
             "basn2c16", "basn3p01", "basn3p04", "basn3p08", "basn4a08",
             "basn4a16", "basn6a08", "basn6a16", "tbbn2c16", "tbyn3p08",
             "s05n3p02", "f03n2c08", "g07n3p04"]
    served = 0
    for name in names:
        img = png.Image.decompress_path(f"{base}/{name}.png")
        blob = img.compress_bytes(level=6, index=True)
        out = decode_indexed([blob, blob], backend="xla")
        if out is None:
            continue  # outside the fast path (e.g. tiny image, no index)
        served += 1
        got = np.asarray(out)
        want = img.unpack_rgba8()
        assert np.array_equal(got[0], want), name
        assert np.array_equal(got[1], want), name
    assert served >= 14, f"only {served} corpus files took the fast path"


def test_index_closure_pngsuite_and_zlib_levels():
    """Fast-path CLOSURE (round-5): every valid PngSuite IDAT and every
    stdlib-zlib level 1-9 stream of representative content indexes —
    the reference's one engine serves any block structure
    (``…InflatorBuffers.Stream.swift:59-141``); this pins how far the
    indexed fast path reaches (the general engines serve the rest)."""
    import glob
    import os
    import zlib

    import conftest
    from swift_png_tpu.lz77.index import build_index
    from swift_png_tpu.png import chunk as chunks
    from swift_png_tpu.png.chunk import ByteSource

    base = os.path.join(conftest.REFERENCE,
                        "Sources/PNGIntegrationTests/Inputs/Common")
    if not os.path.isdir(base):
        pytest.skip("reference corpus unavailable")
    missed = []
    n_ok = 0
    for p in sorted(glob.glob(f"{base}/*.png")):
        src = ByteSource(open(p, "rb").read())
        src.signature()
        idat = bytearray()
        t = None
        while t != chunks.IEND:
            t, pay = src.chunk()
            if t == chunks.IDAT:
                idat += pay
        out = zlib.decompress(bytes(idat))
        if build_index(bytes(idat)[2:-4], len(out), 256) is None:
            missed.append(os.path.basename(p))
        else:
            n_ok += 1
    assert not missed, f"unindexed PngSuite IDATs: {missed}"
    assert n_ok >= 160

    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 255, 1 << 18).astype(np.uint8).tobytes()
    smooth = bytes(np.tile(np.arange(256, dtype=np.uint8), 1024))
    for lvl in range(1, 10):
        for name, payload in (("noisy", noisy), ("smooth", smooth)):
            s = zlib.compress(payload, lvl)
            ix = build_index(s[2:-4], len(payload), 256)
            assert ix is not None, f"zlib -{lvl} {name} missed the index"
