"""Pallas wavefront defilter (interpreter mode) vs. the host oracle."""

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.ops import unfilter, unfilter_pallas


@pytest.mark.parametrize("delay,H,G", [(4, 16, 24), (1, 8, 30), (3, 12, 10),
                                       (8, 9, 5)])
def test_pallas_interpret_matches_oracle(delay, H, G):
    rng = np.random.default_rng(delay * 100 + H)
    filtered = rng.integers(0, 256, (H, 1 + G * delay), dtype=np.uint8)
    filtered[:, 0] = rng.integers(0, 5, H, dtype=np.uint8)
    want = unfilter.defilter_reference(filtered, delay)
    got = np.asarray(unfilter_pallas.defilter_pallas(
        filtered, delay, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_auto_fallback_on_cpu():
    rng = np.random.default_rng(1)
    filtered = rng.integers(0, 256, (8, 1 + 32), dtype=np.uint8)
    filtered[:, 0] = rng.integers(0, 5, 8, dtype=np.uint8)
    got = np.asarray(unfilter_pallas.defilter_auto(filtered, 4))
    want = unfilter.defilter_reference(filtered, 4)
    np.testing.assert_array_equal(got, want)
