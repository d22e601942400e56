"""Encoder-side block decomposition: independent segments compressed in
one batched device program, ordered gather, associative checksum."""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
from jax.sharding import Mesh

from swift_png_tpu.parallel.blocks import deflate_segmented


def payload(n=60_000):
    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
    return (base * (n // 300 + 1))[:n]


def test_segmented_roundtrip():
    data = payload()
    stream = deflate_segmented(data, level=6, segments=8)
    assert zlib.decompress(stream) == data


def test_segmented_mesh_matches_serial():
    data = payload()
    serial = deflate_segmented(data, level=6, segments=4)
    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("images",))
    sharded = deflate_segmented(data, level=6, segments=4, mesh=mesh)
    assert sharded == serial  # byte-identical output under sharding
    assert zlib.decompress(sharded) == data


def test_segmented_tiny_and_odd_sizes():
    for n in (0, 1, 2, 100, 4097):
        data = payload(max(n, 1))[:n]
        stream = deflate_segmented(data, level=4, segments=8)
        assert zlib.decompress(stream) == data
