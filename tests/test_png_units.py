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
