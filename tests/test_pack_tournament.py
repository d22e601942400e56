"""Bit-exactness of the scatter-free tournament packer.

Reference semantics: ``pack_bits32`` (itself differentially tested
against the host ``BitWriter``, the analog of ``LZ77.DeflatorOut.append``
``Sources/LZ77/Deflator/LZ77.DeflatorOut.swift:105-147``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_png_tpu.ops.deflate import (atoms32_to_bytes, pack_bits32,
                                       pack_tournament)


def _case(rng, n, maxb):
    nbits = rng.integers(0, maxb + 1, n).astype(np.int32)
    lo = rng.integers(0, 1 << 31, n).astype(np.int64).astype(np.int32)
    hi = rng.integers(0, 1 << 16, n).astype(np.int64).astype(np.int32)
    for i in range(n):
        b = int(nbits[i])
        if b <= 32:
            lo[i] &= (1 << b) - 1 if b < 32 else -1
            hi[i] = 0
        else:
            hi[i] &= (1 << (b - 32)) - 1
    valid = rng.random(n) > 0.1
    return lo, hi, nbits, valid


@pytest.mark.parametrize("n,maxb", [(1, 48), (5, 14), (257, 48),
                                    (1000, 34)])
def test_tournament_matches_pack_bits32(n, maxb):
    rng = np.random.default_rng(n)
    lo, hi, nbits, valid = _case(rng, n, maxb)
    a1, t1 = pack_bits32(jnp.asarray(lo), jnp.asarray(hi),
                         jnp.asarray(nbits), jnp.asarray(valid), spans=3)
    a2, t2 = pack_tournament(jnp.asarray(lo), jnp.asarray(hi),
                             jnp.asarray(nbits), jnp.asarray(valid),
                             max_bits=maxb)
    assert int(t1) == int(t2)
    assert (atoms32_to_bytes(np.asarray(a1), int(t1))
            == atoms32_to_bytes(np.asarray(a2), int(t2)))


def test_tournament_capped():
    rng = np.random.default_rng(7)
    n = 1000
    nbits = rng.integers(0, 15, n).astype(np.int32)
    lo = (rng.integers(0, 1 << 15, n)
          & ((1 << nbits.astype(np.int64)) - 1)).astype(np.int32)
    hi = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    cap = int(nbits.sum()) // 32 + 4
    a1, t1 = pack_bits32(jnp.asarray(lo), jnp.asarray(hi),
                         jnp.asarray(nbits), jnp.asarray(valid), spans=2)
    a2, t2 = pack_tournament(jnp.asarray(lo), jnp.asarray(hi),
                             jnp.asarray(nbits), jnp.asarray(valid),
                             max_bits=14, cap_words=cap)
    assert int(t1) == int(t2)
    assert (atoms32_to_bytes(np.asarray(a1), int(t1))
            == atoms32_to_bytes(np.asarray(a2), int(t2)))
