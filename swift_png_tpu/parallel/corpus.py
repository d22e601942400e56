"""Corpus bucketing + multi-host sharding for mixed image collections.

The static-shape unit for device compilation is (size, pixel format); real
corpora mix sizes, so batches are formed by bucketing.  Multi-host jobs
shard buckets across processes (DCN) and images across local devices (ICI)
— the codec's data-parallel hierarchy (SURVEY.md §2.4.5).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

from ..png import chunk as chunks
from ..png import parsing
from ..png.chunk import ByteSource
from ..png.format import COMMON, IOS

__all__ = ["probe", "bucket", "shard_buckets", "CorpusDecoder"]


@dataclass(frozen=True)
class ImageProbe:
    """Cheap header-only probe (lexes chunks, inflates nothing)."""

    size: tuple[int, int]
    pixel_name: str
    interlaced: bool
    standard: str

    @property
    def bucket_key(self):
        return (self.size, self.pixel_name, self.interlaced, self.standard)


def probe(data: bytes) -> ImageProbe:
    stream = ByteSource(data)
    stream.signature()
    type_, payload = stream.chunk()
    standard = COMMON
    if type_ == chunks.CgBI:
        standard = IOS
        type_, payload = stream.chunk()
    header = parsing.Header.parse(payload, standard)
    return ImageProbe(header.size, header.pixel.name, header.interlaced,
                      standard)


def bucket(datas: list[bytes]) -> dict:
    """Group PNG byte strings into same-(size, format) buckets.

    Returns {bucket_key: [(original_index, bytes), …]}.
    """
    out: dict = defaultdict(list)
    for i, data in enumerate(datas):
        out[probe(data).bucket_key].append((i, data))
    return dict(out)


def shard_buckets(buckets: dict, process_index: int, process_count: int):
    """Deterministic round-robin assignment of buckets to host processes —
    the DCN axis; devices within a process take the images axis (ICI)."""
    keys = sorted(buckets.keys(), key=repr)
    return {k: buckets[k] for i, k in enumerate(keys)
            if i % process_count == process_index}


class CorpusDecoder:
    """Decode a mixed corpus: bucket, batch per bucket, reassemble in
    input order.  One compiled program per bucket shape."""

    def __init__(self, mesh=None, batch_size: int = 8):
        from .batch import BatchCodec

        self.codec = BatchCodec(mesh)
        self.batch_size = batch_size

    def decode(self, datas: list[bytes], bits: int = 8) -> list[np.ndarray]:
        results: list = [None] * len(datas)
        for key, items in bucket(datas).items():
            for i in range(0, len(items), self.batch_size):
                chunk = items[i:i + self.batch_size]
                idx = [j for j, _ in chunk]
                pixels = self.codec.decode([d for _, d in chunk], bits=bits)
                for row, j in enumerate(idx):
                    results[j] = pixels[row]
        return results
