"""Corruption fuzzing over the round-4 expansion modes.

The checkpoint engine now routes match-dominated content through the
sequential-copy records kernel or the dense distance sweeps and
match-rich foreign content to the host tier; every route must reject
corrupt streams with a typed error (index-build rejection or Adler
mismatch) or decode bit-exact — never crash, hang, or return silently
wrong bytes.  Reference analog: ``ErrorHandling.swift``'s invalid-file
assertions.
"""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu.lz77.errors import LZ77Error
from swift_png_tpu.ops.inflate_checkpoint import CheckpointInflator


def _payloads():
    rng = np.random.default_rng(0)
    smooth = np.repeat(np.arange(64, dtype=np.uint8), 400).tobytes()
    row = rng.integers(0, 48, 257, dtype=np.uint8)
    rich = (np.tile(row, 100)
            + rng.integers(0, 2, 25700, dtype=np.uint8)).tobytes()
    lit = rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
    return {"smooth": smooth, "rich": rich, "literal": lit}


@pytest.mark.parametrize("kind", ["smooth", "rich", "literal"])
@pytest.mark.parametrize("seed", range(6))
def test_bitflips_rejected_or_exact(kind, seed):
    pay = _payloads()[kind]
    comp = bytearray(zlib.compress(pay, 6))
    rng = np.random.default_rng(seed + 7)
    pos = int(rng.integers(2, len(comp) - 4))
    comp[pos] ^= 1 << int(rng.integers(0, 8))
    eng = CheckpointInflator(ob=256, backend="xla")
    try:
        out = eng.inflate_zlib_batch([bytes(comp)], len(pay))
    except (LZ77Error, ValueError, OverflowError):
        return  # typed rejection (index walk, header, or checksum)
    if out is None:
        return  # outside the fast path — the general engines own it
    got = np.asarray(out)[0].tobytes()
    # the engine verified the stream's stored Adler-32; a surviving
    # decode must ALSO agree with zlib on the same bytes
    try:
        want = zlib.decompress(bytes(comp))
    except zlib.error:
        pytest.fail("engine accepted a stream zlib rejects")
    assert got == want


@pytest.mark.parametrize("kind", ["smooth", "rich", "literal"])
def test_truncations_rejected(kind):
    pay = _payloads()[kind]
    comp = zlib.compress(pay, 6)
    eng = CheckpointInflator(ob=256, backend="xla")
    for frac in (0.3, 0.8, 0.97):
        cut = comp[: int(len(comp) * frac)]
        try:
            out = eng.inflate_zlib_batch([cut], len(pay))
        except (LZ77Error, ValueError):
            continue
        assert out is None, "truncated stream must not decode"
