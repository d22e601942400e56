"""From-scratch Adler-32 and CRC-32, with parallel *combine* operators.

Behavioral counterparts of the reference's ``LZ77.MRC32``
(``Sources/LZ77/Wrappers/LZ77.MRC32.swift:5-51``, Adler-32 with 5552-byte mod
folding) and the external ``CRC`` module it depends on (``Package.swift:14-22``).

TPU-first design note: both checksums are *combinable* —

* Adler-32 is affine in the data: ``adler(A||B)`` is recoverable from
  ``adler(A)``, ``adler(B)`` and ``len(B)``;
* CRC-32 is GF(2)-linear: ``crc(A||B) = shift(crc(A), len(B)) ^ crc(B)``
  where ``shift`` is multiplication by ``x^(8·len)`` mod the CRC polynomial.

This is what lets the parallel batch codec checksum shards independently and
reduce with a ``psum``-style tree combine (SURVEY.md §2.4.4) instead of the
reference's sequential ``StreamIntegral.update``.
"""

from __future__ import annotations

import numpy as np

ADLER_MOD = 65521
CRC32_POLY = 0xEDB88320  # reflected polynomial


# ---------------------------------------------------------------------------
# Adler-32
# ---------------------------------------------------------------------------

def adler32(data: bytes | bytearray | memoryview | np.ndarray, state: int = 1) -> int:
    """Adler-32 of ``data``, continuing from ``state`` (default fresh = 1).

    Vectorized: s1' = s1 + Σd_i ; s2' = s2 + n·s1 + Σ (n-i)·d_i, chunked so the
    weighted sums stay inside int64.
    """
    if isinstance(data, np.ndarray):
        arr = data.astype(np.int64, copy=False).ravel()
    else:
        arr = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int64)
    s1 = state & 0xFFFF
    s2 = (state >> 16) & 0xFFFF
    # chunk bound: sum of weights < 2^63 → n*(n+1)/2 * 255 < 2^63 → n ~ 2.6e8;
    # use 1<<26 to stay comfortably clear even with carried state.
    CHUNK = 1 << 26
    for off in range(0, arr.size, CHUNK):
        chunk = arr[off : off + CHUNK]
        n = chunk.size
        total = int(chunk.sum())
        # Σ (n - i) · d_i  for i = 0..n-1
        weighted = int((chunk * np.arange(n, 0, -1, dtype=np.int64)).sum())
        s2 = (s2 + n * s1 + weighted) % ADLER_MOD
        s1 = (s1 + total) % ADLER_MOD
    return (s2 << 16) | s1


def adler32_combine(a: int, b: int, len_b: int) -> int:
    """Checksum of ``A||B`` given ``adler32(A)``, ``adler32(B)``, ``len(B)``."""
    a1, a2 = a & 0xFFFF, (a >> 16) & 0xFFFF
    b1, b2 = b & 0xFFFF, (b >> 16) & 0xFFFF
    rem = len_b % ADLER_MOD
    s1 = (a1 + b1 - 1) % ADLER_MOD
    s2 = (a2 + b2 + rem * a1 - rem) % ADLER_MOD
    return (s2 << 16) | s1


# ---------------------------------------------------------------------------
# CRC-32
# ---------------------------------------------------------------------------

def _build_crc_tables(slices: int = 8) -> np.ndarray:
    tables = np.zeros((slices, 256), dtype=np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (CRC32_POLY if crc & 1 else 0)
        tables[0, i] = crc
    for s in range(1, slices):
        prev = tables[s - 1]
        tables[s] = tables[0][prev & 0xFF] ^ (prev >> 8)
    return tables


_CRC_TABLES = _build_crc_tables()
_CRC_TABLE = _CRC_TABLES[0]


def crc32(data: bytes | bytearray | memoryview | np.ndarray, state: int = 0) -> int:
    """CRC-32 (IEEE, reflected) of ``data``, continuing from ``state``.

    Slicing-by-8 over a numpy view; the per-8-byte carry is sequential, so the
    host loop runs per 8-byte group — the native engine and the device kernel
    replace this for bulk data.
    """
    if isinstance(data, np.ndarray):
        buf = data.tobytes()
    else:
        buf = bytes(data)
    crc = state ^ 0xFFFFFFFF
    n8 = len(buf) // 8
    t = _CRC_TABLES
    view = np.frombuffer(buf[: 8 * n8], dtype="<u8")
    t7, t6, t5, t4 = t[7], t[6], t[5], t[4]
    t3, t2, t1, t0 = t[3], t[2], t[1], t[0]
    for word in view:
        w = int(word) ^ crc
        crc = int(
            t7[w & 0xFF]
            ^ t6[(w >> 8) & 0xFF]
            ^ t5[(w >> 16) & 0xFF]
            ^ t4[(w >> 24) & 0xFF]
            ^ t3[(w >> 32) & 0xFF]
            ^ t2[(w >> 40) & 0xFF]
            ^ t1[(w >> 48) & 0xFF]
            ^ t0[(w >> 56) & 0xFF]
        )
    for byte in buf[8 * n8 :]:
        crc = int(_CRC_TABLE[(crc ^ byte) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _gf2_matrix_times(mat: list[int], vec: int) -> int:
    total = 0
    i = 0
    while vec:
        if vec & 1:
            total ^= mat[i]
        vec >>= 1
        i += 1
    return total


def _gf2_matrix_square(mat: list[int]) -> list[int]:
    return [_gf2_matrix_times(mat, mat[i]) for i in range(32)]


def crc32_combine(a: int, b: int, len_b: int) -> int:
    """CRC of ``A||B`` given ``crc32(A)``, ``crc32(B)``, ``len(B)``.

    Applies the x^(8·len_b) shift operator to ``a`` by repeated matrix
    squaring over GF(2) — the standard parallel-CRC construction.
    """
    if len_b == 0:
        return a
    crc = a
    op = [CRC32_POLY] + [1 << (i - 1) for i in range(1, 32)]  # one-zero-bit shift
    n = len_b * 8
    while n:
        if n & 1:
            crc = _gf2_matrix_times(op, crc)
        n >>= 1
        if n:
            op = _gf2_matrix_square(op)
    return crc ^ b
