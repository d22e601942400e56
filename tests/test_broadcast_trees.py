"""Broadcast of shared Huffman state across a batch (SURVEY §2.4.3).

When batch-encoding similar images, one tree set built from the pooled
term frequencies is broadcast to every shard; each image's tokens pack
against the same tables (one header, identical per-block tables).  This
trades a little ratio for one tree build + table broadcast instead of B —
the analog of the reference's per-block ``DeflatorTables`` becoming
mesh-shared state.
"""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.parallel.batch import deflate_shared_trees


def _batch(B=4, n=20_000):
    rng = np.random.default_rng(17)
    base = rng.integers(0, 64, 400, dtype=np.uint8)
    out = []
    for i in range(B):
        noise = rng.integers(0, 4, n, dtype=np.uint8)
        img = (np.tile(base, n // 400 + 1)[:n] + noise).astype(np.uint8)
        out.append(img.tobytes())
    return out


def test_shared_trees_roundtrip_and_ratio():
    from swift_png_tpu.ops.deflate import deflate_device

    payloads = _batch()
    shared = deflate_shared_trees(payloads, level=6)
    per_image = [deflate_device(p, level=6) for p in payloads]
    for data, s in zip(payloads, shared):
        assert zlib.decompress(s) == data
    shared_total = sum(map(len, shared))
    solo_total = sum(map(len, per_image))
    # similar images: the pooled tree costs only a little ratio
    assert shared_total <= solo_total * 1.05, (shared_total, solo_total)
    print(f"\nshared trees: {shared_total} vs per-image {solo_total} "
          f"({shared_total / solo_total * 100:.1f}%)")
