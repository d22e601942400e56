"""Device wavefront defilter vs. the host row-serial oracle."""

import numpy as np
import pytest

import conftest  # noqa: F401  (sets JAX_PLATFORMS=cpu + 8 virtual devices)

from swift_png_tpu.ops import unfilter


@pytest.mark.parametrize("delay", [1, 2, 3, 4, 6, 8])
@pytest.mark.parametrize("shape", [(1, 1), (3, 2), (16, 24), (23, 17)])
def test_wavefront_matches_host(delay, shape):
    H, Gpx = shape
    pitch = Gpx * delay
    rng = np.random.default_rng(delay * 1000 + H * 31 + Gpx)
    filtered = rng.integers(0, 256, (H, 1 + pitch), dtype=np.uint8)
    filtered[:, 0] = rng.integers(0, 5, H, dtype=np.uint8)
    want = unfilter.defilter_reference(filtered, delay)
    got = np.asarray(unfilter.defilter(filtered, delay))
    np.testing.assert_array_equal(got, want)


def test_each_filter_type_alone():
    rng = np.random.default_rng(7)
    for ftype in range(5):
        filtered = rng.integers(0, 256, (8, 1 + 12), dtype=np.uint8)
        filtered[:, 0] = ftype
        want = unfilter.defilter_reference(filtered, 3)
        got = np.asarray(unfilter.defilter(filtered, 3))
        np.testing.assert_array_equal(got, want, err_msg=f"filter {ftype}")


def test_invalid_filter_type_passthrough():
    rng = np.random.default_rng(9)
    filtered = rng.integers(0, 256, (4, 1 + 8), dtype=np.uint8)
    filtered[:, 0] = 200  # invalid → data passes through unchanged
    got = np.asarray(unfilter.defilter(filtered, 2))
    np.testing.assert_array_equal(got, filtered[:, 1:])


def test_batch_matches_single():
    rng = np.random.default_rng(11)
    batch = rng.integers(0, 256, (5, 12, 1 + 16), dtype=np.uint8)
    batch[:, :, 0] = rng.integers(0, 5, (5, 12), dtype=np.uint8)
    got = np.asarray(unfilter.defilter_batch(batch, 4))
    for i in range(5):
        np.testing.assert_array_equal(
            got[i], np.asarray(unfilter.defilter(batch[i], 4)))
