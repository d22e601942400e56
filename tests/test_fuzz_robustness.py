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
    for _ in range(6):
        garbage = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
        with pytest.raises((LZ77Error, ValueError)):
            ENGINE.inflate(b"\x78\x9c" + garbage, 1000, "ios")
        with pytest.raises(native.NativeError):
            native.inflate(b"\x78\x9c" + garbage[:-4], 1000, "zlib")


def test_gzip_fextra_overflow_rejected():
    # crafted FEXTRA xlen pointing far past the buffer must not read OOB
    hdr = bytes([0x1F, 0x8B, 0x08, 0x04, 0, 0, 0, 0, 0, 0xFF,
                 0xFF, 0xFF]) + b"\x00" * 6
    with pytest.raises(native.NativeError):
        native.inflate(hdr, 100, "gzip")


def test_pow2_boundary_streams_decode():
    # valid fixed-Huffman streams whose EOB lands within the last few bytes
    # of a power-of-two-sized buffer (per-block device engine regression)
    from swift_png_tpu.ops import inflate as perblock

    for n in (1019, 1020, 1021, 1022, 1025):
        data = _sample(n * 3, seed=n)
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
        comp = co.compress(data) + co.flush()
        body = comp[2:-4]
        want = zlib.decompress(comp)
        for size in range(len(body) - 3, len(body) + 1):
            trial = body[:size] if size <= len(body) else body
            if size == len(body):
                out = perblock.inflate(trial, len(want), "ios")
                assert bytes(out) == want, n


def test_truncated_raises_typed_error_device():
    from swift_png_tpu.lz77.errors import LZ77Error as E
    from swift_png_tpu.ops import inflate as perblock

    data = _sample(2000, 42)
    comp = zlib.compress(data, 6)
    for cut in (2, 6, 30):
        with pytest.raises(E):
            perblock.inflate(comp[2:cut + 2], len(data), "ios")


def test_scalar_pack_indexed_exact_match():
    from swift_png_tpu.models import V
    from swift_png_tpu.png.format import Format

    # palette has (7,1,2,255): gray 7 must NOT match it (needs (7,7,7,255))
    fmt = Format("indexed8", ((0, 0, 0, 255), (7, 1, 2, 255), (7, 7, 7, 255)))
    idx = V.of8.pack(np.array([[7, 0]], np.uint8), fmt)
    assert list(idx) == [2, 0]


def test_fuzz_round2_engines_differential():
    """Randomized differential over the round-2 engines: segmented
    parallel deflate, device optimal parse, and the indexed lockstep
    inflate all agree with stdlib zlib."""
    import zlib

    import numpy as np

    from swift_png_tpu import native
    from swift_png_tpu.ops.deflate_optimal import deflate_device_optimal
    from swift_png_tpu.parallel.blocks import deflate_segmented
    from swift_png_tpu.ops.inflate_checkpoint import CheckpointInflator

    rng = np.random.default_rng(2026)
    eng = CheckpointInflator(ob=512)
    for trial in range(12):
        n = int(rng.integers(1, 30_000))
        style = trial % 4
        if style == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif style == 1:
            data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        elif style == 2:
            base = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
            data = (base * (n // 64 + 1))[:n]
        else:
            data = bytes(np.repeat(
                rng.integers(0, 256, max(1, n // 100), dtype=np.uint8),
                100))[:n]
        s1 = deflate_segmented(data, level=int(rng.integers(0, 8)),
                               segments=int(rng.integers(1, 6)))
        assert zlib.decompress(s1) == data, (trial, "segmented")
        s2 = deflate_device_optimal(data, level=int(rng.integers(8, 14)))
        assert zlib.decompress(s2) == data, (trial, "optimal")
        if native.available() and n >= 8:
            s3 = native.deflate(data, 6, "zlib", block_terms=1 << 22)
            out = eng.inflate_zlib_batch([s3], n, keep_on_device=False)
            if out is not None:
                assert bytes(out[0]) == data, (trial, "indexed")
