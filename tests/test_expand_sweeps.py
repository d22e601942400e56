"""Dense distance-sweep expansion for match-rich streams (round 4).

Foreign-encoder streams (zlib -9 class) produce ~50 % match bytes; the
sweep mode resolves the top-K distances with dense shifted selects and
finishes the residual through the compacted chase.  Reference
semantics: byte-by-byte forward copy (``LZ77.InflatorOut.swift:
124-139``).
"""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from swift_png_tpu.ops.inflate_checkpoint import (CheckpointInflator,
                                                  _expand, _expand_legacy)


def _rich_ptr(rng, B, Opad, dists):
    N = B * Opad
    ptr = np.arange(N, dtype=np.int32)
    lit = rng.integers(0, 256, N, dtype=np.uint8)
    for b in range(B):
        base = b * Opad
        pos = 10
        while pos < Opad - 40:
            ln = int(rng.integers(3, 20))
            d = min(int(rng.choice(dists)), pos)
            ln = min(ln, Opad - pos - 1)
            ptr[base + pos:base + pos + ln] = (
                base + np.arange(pos, pos + ln) - d)
            pos += ln + int(rng.integers(1, 6))
    return jnp.asarray(ptr), jnp.asarray(lit)


@pytest.mark.parametrize("dists", [
    [1, 3, 4, 7, 8, 12, 200, 2052],
    [5],                      # one distance, chains through it
    list(range(1, 70)),       # more distinct distances than sweep_k
])
def test_sweeps_match_legacy(dists):
    rng = np.random.default_rng(hash(tuple(dists)) % 2**31)
    B, Opad = 2, 128 * 40
    ptr, lit = _rich_ptr(rng, B, Opad, dists)
    N = B * Opad
    nm = int(np.sum(np.asarray(ptr) != np.arange(N)))
    cap = 1 << int(np.ceil(np.log2(nm + 64)))
    o1, v1, _, _ = jax.jit(lambda p, l: _expand_legacy(
        p, l, cap, None, (B, Opad)))(ptr, lit)
    # grow the residual cap until the sweeps converge (run() policy)
    rc = 8192
    while True:
        o2, v2, _, _ = jax.jit(lambda p, l, rc=rc: _expand(
            p, l, rc, None, (B, Opad), "heavy", None, True, 16))(ptr, lit)
        if not bool(v2):
            break
        rc *= 4
        assert rc <= N, "residual cap runaway"
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_foreign_zlib9_rides_sweeps_end_to_end():
    """A real zlib-9 stream over repetitive content routes through the
    sweeps (records overflow) and decodes bit-exact with a verified
    Adler-32."""
    rng = np.random.default_rng(3)
    row = rng.integers(0, 48, 257, dtype=np.uint8)
    pay = (np.tile(row, 400) + rng.integers(0, 2, 257 * 400,
                                            dtype=np.uint8)).tobytes()
    stream = zlib.compress(pay, 9)
    eng = CheckpointInflator(ob=256, backend="xla")
    out = eng.inflate_zlib_batch([stream], len(pay))
    assert out is not None
    assert np.asarray(out)[0].tobytes() == pay
