"""PNG unit tests.

Counterpart of ``Sources/PNGTests/``: ``Filtering.swift:9-66``
(filter∘defilter = identity for delays 1…8 on random 24×16 scanlines) and
``Premultiplication.swift:8-48`` (premultiply/straighten round-trip vs
floating-point ground truth).
"""

import numpy as np
import pytest

from swift_png_tpu.models import premultiply, straighten
from swift_png_tpu.png.decoder import defilter, paeth
from swift_png_tpu.png.encoder import filter_candidates, filter_select


@pytest.mark.parametrize("delay", range(1, 9))
def test_filter_defilter_identity(delay):
    rng = np.random.default_rng(delay)
    last_raw = rng.integers(0, 256, 24 * delay, dtype=np.uint8)
    for _ in range(16):
        cur = rng.integers(0, 256, 24 * delay, dtype=np.uint8)
        for ftype in range(5):
            cands = filter_candidates(cur, last_raw, delay)
            line = np.concatenate([[ftype], cands[ftype]]).astype(np.uint8)
            defilter(line, np.concatenate([[0], last_raw]).astype(np.uint8), delay)
            assert np.array_equal(line[1:], cur), ftype
        # the selected filter also round-trips
        sel = filter_select(cur, last_raw, delay)
        defilter(sel, np.concatenate([[0], last_raw]).astype(np.uint8), delay)
        assert np.array_equal(sel[1:], cur)
        last_raw = cur


def test_premultiply_8bit_exhaustive():
    """Exhaustive 8-bit check against floating-point ground truth
    (``Premultiplication.swift:8-48``): premultiply rounds to nearest, and
    straighten(premultiply(x)) re-premultiplies to the same value."""
    color, alpha = np.meshgrid(
        np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8))
    pm = premultiply(color, alpha)
    truth = (color.astype(np.float64) * alpha.astype(np.float64) / 255.0)
    assert (np.abs(pm.astype(np.float64) - truth) <= 0.5 + 1e-9).all()
    st = straighten(pm, alpha)
    again = premultiply(st, alpha)
    assert np.array_equal(again, pm)


def test_premultiply_16bit_sampled():
    rng = np.random.default_rng(7)
    color = rng.integers(0, 65536, 4096, dtype=np.uint16)
    alpha = rng.integers(0, 65536, 4096, dtype=np.uint16)
    pm = premultiply(color, alpha)
    truth = color.astype(np.float64) * alpha.astype(np.float64) / 65535.0
    assert (np.abs(pm.astype(np.float64) - truth) <= 0.5 + 1e-9).all()
    st = straighten(pm, alpha)
    assert np.array_equal(premultiply(st, alpha), pm)


def test_paeth_matches_spec():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, 1000, dtype=np.uint8)
    b = rng.integers(0, 256, 1000, dtype=np.uint8)
    c = rng.integers(0, 256, 1000, dtype=np.uint8)
    got = paeth(a, b, c)

    def spec(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    want = np.array([spec(*t) for t in zip(a, b, c)], np.uint8)
    assert np.array_equal(got, want)


def test_inspection_dump():
    from swift_png_tpu.inspection import describe_image, describe_metadata
    from swift_png_tpu.png.image import Image
    from swift_png_tpu.png.metadata import Metadata

    assert describe_metadata(Metadata()) == "(no metadata)"
    import os
    path = ("/root/reference/Sources/PNGIntegrationTests/Inputs/Common/"
            "ccwn2c08.png")
    if os.path.exists(path):
        desc = describe_image(Image.decompress_path(path))
        assert "32×32" in desc and "chromaticity" in desc and "gamma" in desc


def test_scalar_target_roundtrip():
    import numpy as np
    from swift_png_tpu.models import V
    from swift_png_tpu.png.format import Format

    rng = np.random.default_rng(4)
    for kind in ("v8", "v16", "rgb8", "rgba8"):
        fmt = Format(kind)
        y, x = 4, 6
        vals = rng.integers(0, 256, (y, x), dtype=np.uint8)
        storage = V.of8.pack(vals, fmt)
        back = V.of8.unpack(storage, fmt, (x, y))
        assert (back == vals).all(), kind


def test_custom_deindexer_indexer_hooks():
    """Vectorized analog of ``PNG.Color`` custom de/indexer closures
    (``PNG.Color.swift:13-155``)."""
    import numpy as np
    from swift_png_tpu.models import RGBA, V
    from swift_png_tpu.png.format import Format

    palette = ((10, 20, 30, 255), (200, 100, 50, 128), (0, 0, 0, 0))
    fmt = Format("indexed8", palette)
    storage = np.array([0, 1, 2, 1], np.uint8)

    # custom deindexer: swap channels and force alpha opaque
    def deindexer(pal):
        t = np.array(pal, np.uint8)
        return np.stack([t[:, 2], t[:, 1], t[:, 0],
                         np.full(len(pal), 255, np.uint8)], axis=1)

    got = RGBA.of8.unpack(storage, fmt, (4, 1), deindexer=deindexer)
    assert tuple(got[0, 1]) == (50, 100, 200, 255)

    # custom indexer: nearest-entry by red channel only
    def indexer(pal):
        reds = np.array([p[0] for p in pal], np.int32)

        def fn(aggregates):
            d = np.abs(aggregates[:, 0].astype(np.int32)[:, None]
                       - reds[None, :])
            return np.argmin(d, axis=1).astype(np.uint8)

        return fn

    px = np.array([[199, 0, 0, 255], [9, 9, 9, 255]], np.uint8)
    idx = RGBA.of8.pack(px, fmt, indexer=indexer)
    assert list(idx) == [1, 0]

    # V target custom deindexer: luma-ish table
    def vdeindexer(pal):
        t = np.array(pal, np.uint16)
        return ((t[:, 0] + t[:, 1] + t[:, 2]) // 3).astype(np.uint8)

    gv = V.of8.unpack(storage, fmt, (4, 1), deindexer=vdeindexer)
    assert int(gv[0, 0]) == 20


def test_format_validate_sample_ranges():
    import pytest as _pytest

    from swift_png_tpu.png.errors import ParsingError
    from swift_png_tpu.png.format import Format

    # v8 fill beyond 8-bit depth (bKGD carries 16-bit fields)
    with _pytest.raises(ParsingError):
        Format("v8", (), fill=256).validate()
    # rgb8 key component out of range
    with _pytest.raises(ParsingError):
        Format("rgb8", (), key=(0, 300, 0)).validate()
    # rgba16 fill is fine at the full range
    Format("rgba16", (), fill=(65535, 0, 1)).validate()
    # v16 key at max is fine
    Format("v16", (), key=65535).validate()
