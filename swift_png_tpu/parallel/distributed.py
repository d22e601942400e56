"""Multi-host initialization and cross-host stream assembly.

The communication backend is XLA collectives over ICI within a slice and
DCN across hosts (SURVEY.md §2.4.5): ``jax.distributed.initialize`` for
process bring-up, a global mesh over every device, and host-side ordered
gather for compressed outputs whose checksums combine associatively
(:func:`swift_png_tpu.lz77.checksums.adler32_combine` /
``crc32_combine``) — replacing the reference's sequential
``StreamIntegral.update`` (``Sources/LZ77/Wrappers/LZ77.MRC32.swift:26``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from ..lz77.checksums import adler32_combine, crc32_combine

__all__ = ["initialize", "global_mesh", "combine_adler_shards",
           "combine_crc_shards"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up multi-process JAX (no-op for single-process jobs)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(images_axis: str = "images",
                rows_axis: str = "rows", rows: int = 1) -> Mesh:
    """A (images × rows) mesh over every addressable device in the job."""
    devices = np.array(jax.devices())
    if devices.size % rows:
        raise ValueError(f"{devices.size} devices not divisible into "
                         f"{rows} row shards")
    return Mesh(devices.reshape(devices.size // rows, rows),
                (images_axis, rows_axis))


def combine_adler_shards(parts: list[tuple[int, int]]) -> int:
    """Adler-32 of a concatenation from per-shard ``(adler, length)``
    pairs — an associative tree combine."""
    total = 1
    for a, length in parts:
        total = adler32_combine(total, a, length)
    return total


def combine_crc_shards(parts: list[tuple[int, int]]) -> int:
    """CRC-32 of a concatenation from per-shard ``(crc, length)`` pairs."""
    total = 0
    for c, length in parts:
        total = crc32_combine(total, c, length)
    return total
