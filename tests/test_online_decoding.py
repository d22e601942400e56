"""Streaming/online decoding through ``png.Context``.

Counterpart of ``Snippets/PNG/OnlineDecoding.swift``: lex chunks manually,
construct the context at the first IDAT, feed partial data, optionally
overdraw-fill for progressive display, and finish with ancillary chunks.
"""

import os

import numpy as np
import pytest

import conftest

from swift_png_tpu import png
from swift_png_tpu.png import chunk as chunks
from swift_png_tpu.png import parsing
from swift_png_tpu.png.chunk import ByteSource
from swift_png_tpu.png.context import Context
from swift_png_tpu.png.format import COMMON
from swift_png_tpu.png.metadata import Metadata

BASE = os.path.join(conftest.REFERENCE, "Sources/PNGIntegrationTests")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference corpus unavailable")


def _lex(data):
    src = ByteSource(data)
    src.signature()
    out = []
    while True:
        t, payload = src.chunk()
        out.append((t, payload))
        if t == "IEND":
            return out


def _context_for(chunk_list):
    header = palette = None
    state = {"background": None, "transparency": None}
    metadata = Metadata()
    for t, payload in chunk_list:
        if t == chunks.IHDR:
            header = parsing.Header.parse(payload, COMMON)
        elif t == chunks.PLTE:
            palette = parsing.Palette.parse(payload, header.pixel)
        elif t == chunks.IDAT:
            break
        else:
            metadata.push_ancillary(t, payload, header.pixel, palette, state)
    return Context(COMMON, header, palette, state["background"],
                   state["transparency"], metadata)


@pytest.mark.parametrize("name", ["basn6a08", "basi6a08", "basi3p02"])
def test_byte_at_a_time_streaming(name):
    data = open(f"{BASE}/Inputs/Common/{name}.png", "rb").read()
    chunk_list = _lex(data)
    ctx = _context_for(chunk_list)
    for t, payload in chunk_list:
        if t == chunks.IDAT:
            # trickle the chunk through in small fragments
            for i in range(0, len(payload), 7):
                ctx.push_data(payload[i:i + 7])
    for t, payload in chunk_list:
        if t not in (chunks.IHDR, chunks.PLTE, chunks.IDAT, "CgBI"):
            idx = [x for x, _ in chunk_list].index(chunks.IDAT)
            if chunk_list.index((t, payload)) > idx:
                ctx.push_ancillary(t, payload)
    want = png.Image.decompress_bytes(data).unpack_rgba16()
    got = ctx.image.unpack_rgba16()
    np.testing.assert_array_equal(got, want)


def test_progressive_overdraw_fills_image():
    name = "basi6a08"  # interlaced rgba8
    data = open(f"{BASE}/Inputs/Common/{name}.png", "rb").read()
    chunk_list = _lex(data)
    ctx = _context_for(chunk_list)
    idats = [p for t, p in chunk_list if t == chunks.IDAT]
    payload = b"".join(idats)
    # push roughly the first pass's worth and overdraw: decoded pass-1
    # pixels brush-fill their 8×8 blocks (PNG.Image.overdraw semantics)
    prefix = 48
    ctx.push_data(payload[:prefix], overdraw=True)
    partial = ctx.image.unpack_rgba8()
    assert (partial[0:8, 0:8] == partial[0, 0]).all()
    assert (partial[0:8, 8:16] == partial[0, 8]).all()
    # finishing the stream converges to the exact image
    ctx.push_data(payload[prefix:])
    want = png.Image.decompress_bytes(data).unpack_rgba8()
    np.testing.assert_array_equal(ctx.image.unpack_rgba8(), want)


def test_incomplete_stream_raises_on_iend():
    from swift_png_tpu.png.errors import DecodingError

    data = open(f"{BASE}/Inputs/Common/basn6a08.png", "rb").read()
    chunk_list = _lex(data)
    ctx = _context_for(chunk_list)
    idat = b"".join(p for t, p in chunk_list if t == chunks.IDAT)
    ctx.push_data(idat[: len(idat) // 2])
    with pytest.raises(DecodingError):
        ctx.push_ancillary(chunks.IEND, b"")
