"""Device filter-select and convolve kernels vs. the host oracles."""

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.models import RGBA, premultiply as host_premultiply, \
    straighten as host_straighten
from swift_png_tpu.ops import convolve, filter as filt
from swift_png_tpu.png.encoder import filter_select as host_filter_select


@pytest.mark.parametrize("delay", [1, 3, 4, 8])
def test_filter_select_matches_host(delay):
    rng = np.random.default_rng(delay)
    H, pitch = 16, 24 * delay
    rows = rng.integers(0, 256, (H, pitch), dtype=np.uint8)
    got = np.asarray(filt.filter_select(rows, delay))
    prev = np.zeros(pitch, np.uint8)
    for y in range(H):
        want = host_filter_select(rows[y], prev, delay)
        np.testing.assert_array_equal(got[y], want, err_msg=f"row {y}")
        prev = rows[y]


def test_filter_select_low_entropy_rows():
    # constant rows should pick cheap filters deterministically (tie → lowest)
    rows = np.zeros((4, 12), np.uint8)
    got = np.asarray(filt.filter_select(rows, 3))
    assert (got[:, 0] == 0).all()


@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
def test_samples_roundtrip(depth):
    rng = np.random.default_rng(depth)
    H, W = 5, 13
    channels = 1 if depth < 8 else 3
    samples = rng.integers(0, 1 << depth, (H, W, channels), dtype=np.int64)
    rows = np.asarray(convolve.pack_rows(samples.astype(np.int32),
                                         depth, channels, W))
    back = np.asarray(convolve.samples_from_rows(rows, depth, channels, W))
    np.testing.assert_array_equal(back, samples)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize(
    "kind,depth,channels",
    [("v8", 8, 1), ("v16", 16, 1), ("va8", 8, 2), ("rgb8", 8, 3),
     ("rgba8", 8, 4), ("rgba16", 16, 4), ("bgra8", 8, 4), ("v4", 4, 1)])
def test_unpack_rgba_matches_host(bits, kind, depth, channels):
    rng = np.random.default_rng(hash((bits, kind)) & 0xFFFF)
    W, H = 9, 4
    pitch = (W * depth * channels + 7) >> 3
    rows = rng.integers(0, 256, (H, pitch), dtype=np.uint8)
    # zero padding bits at row end for sub-byte widths
    storage_rows = []
    target = RGBA.of8 if bits == 8 else RGBA.of16

    class _Fmt:
        is_indexed = False
        is_bgr = kind.startswith("bgr")
        key = None
        palette = None

        class pixel:
            pass

    _Fmt.kind = kind
    _Fmt.pixel.depth = depth
    _Fmt.pixel.channels = channels

    # host oracle works from storage: one unscaled sample per byte for
    # sub-byte, big-endian pairs for 16-bit
    from swift_png_tpu.png.format import Layout  # noqa: F401  (import check)
    raw = np.asarray(convolve.samples_from_rows(rows, depth, channels, W))
    if depth == 16:
        flat = raw.reshape(-1)
        storage = np.empty(flat.size * 2, np.uint8)
        storage[0::2] = (flat >> 8).astype(np.uint8)
        storage[1::2] = (flat & 0xFF).astype(np.uint8)
    else:
        storage = raw.reshape(-1).astype(np.uint8)
    want = target.unpack(storage, _Fmt, (W, H))
    got = np.asarray(convolve.unpack_rgba(
        rows, depth=depth, channels=channels, width=W,
        is_bgr=_Fmt.is_bgr, bits=bits))
    np.testing.assert_array_equal(got, want)
    del storage_rows


def test_unpack_indexed_and_key():
    rng = np.random.default_rng(3)
    W, H = 8, 3
    palette = rng.integers(0, 256, (16, 4), dtype=np.uint16)
    rows = rng.integers(0, 16, (H, W), dtype=np.uint8)
    got = np.asarray(convolve.unpack_rgba(
        rows, depth=8, channels=1, width=W, is_indexed=True,
        palette=palette.astype(np.int32), bits=16))
    q = 65535 // 255
    np.testing.assert_array_equal(got, (palette[rows] * q).astype(np.uint16))

    # grayscale chroma key
    rows_v = rng.integers(0, 2, (H, W), dtype=np.uint8) * 7
    got = np.asarray(convolve.unpack_rgba(
        rows_v, depth=8, channels=1, width=W, has_key=True,
        key=np.array([7], np.int32), bits=8))
    np.testing.assert_array_equal(got[..., 3] == 0, rows_v == 7)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_premultiply_straighten_match_host(dtype):
    rng = np.random.default_rng(5)
    tmax = np.iinfo(dtype).max
    color = rng.integers(0, int(tmax) + 1, (64, 3)).astype(dtype)
    alpha = rng.integers(0, int(tmax) + 1, (64, 3)).astype(dtype)
    np.testing.assert_array_equal(
        np.asarray(convolve.premultiply(color, alpha)),
        host_premultiply(color, alpha))
    np.testing.assert_array_equal(
        np.asarray(convolve.straighten(color, alpha)),
        host_straighten(color, alpha))


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize(
    "kind,depth,channels",
    [("v8", 8, 1), ("va8", 8, 2), ("rgb8", 8, 3), ("rgba16", 16, 4),
     ("bgra8", 8, 4)])
def test_samples_to_va_matches_host(bits, kind, depth, channels):
    from swift_png_tpu.models import VA

    rng = np.random.default_rng(hash((bits, kind)) & 0xFFFF)
    W, H = 7, 5
    raw = rng.integers(0, 1 << depth, (H, W, channels)).astype(np.int32)
    target = VA.of8 if bits == 8 else VA.of16

    class _Fmt:
        is_indexed = False
        is_bgr = kind.startswith("bgr")
        key = None
        palette = None

        class pixel:
            pass

    _Fmt.kind = kind
    _Fmt.pixel.depth = depth
    _Fmt.pixel.channels = channels

    if depth == 16:
        flat = raw.reshape(-1)
        storage = np.empty(flat.size * 2, np.uint8)
        storage[0::2] = (flat >> 8).astype(np.uint8)
        storage[1::2] = (flat & 0xFF).astype(np.uint8)
    else:
        storage = raw.reshape(-1).astype(np.uint8)
    want = target.unpack(storage, _Fmt, (W, H))
    got = np.asarray(convolve.samples_to_va(
        raw, depth=depth, channels=channels, is_bgr=_Fmt.is_bgr, bits=bits))
    np.testing.assert_array_equal(got, want)
