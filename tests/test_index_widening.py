"""Round-4 index structural widening (VERDICT #5).

Multi-gap stored chains (Z_FULL_FLUSH markers between stored blocks)
and empty dynamic flush blocks between data blocks now ride the indexed
fast path; reference behavior for the stored chains is
``…InflatorBuffers.Stream.swift:384-399``.
"""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

from swift_png_tpu import native
from swift_png_tpu.lz77.index import (CheckpointIndex, _build_index_host,
                                      build_index)
from swift_png_tpu.ops.inflate_checkpoint import CheckpointInflator


def _stored_chain_stream(n=60000, chunk=7000, markers=1):
    rng = np.random.default_rng(5)
    pay = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    co = zlib.compressobj(0)
    out = b""
    for i in range(0, n, chunk):
        out += co.compress(pay[i:i + chunk])
        for _ in range(markers):
            out += co.flush(zlib.Z_FULL_FLUSH)
    out += co.flush()
    return pay, out


def _empty_dyn_stream(n=40000, chunk=2000):
    pay = (open("/root/reference/README.md", "rb").read() * 8)[:n]
    co = zlib.compressobj(6)
    out = b""
    for i in range(0, n, chunk):
        out += co.compress(pay[i:i + chunk])
        out += co.flush(zlib.Z_FULL_FLUSH)
    out += co.flush()
    return pay, out


@pytest.mark.parametrize("markers", [1, 2, 3])
def test_stored_chain_flush_markers_indexed(markers):
    pay, stream = _stored_chain_stream(markers=markers)
    body = stream[2:-4]
    ix = _build_index_host(body, len(pay), 256)
    assert ix is not None, "stored chain with markers must index"
    # ≥ one empty marker + the resuming header (zlib may coalesce
    # redundant consecutive flushes)
    assert 10 <= int(ix.gap_len.max()) <= 5 * (1 + markers)
    eng = CheckpointInflator(ob=256, backend="xla")
    got = eng.inflate_zlib_batch([stream], len(pay))
    assert np.asarray(got)[0].tobytes() == pay


@pytest.mark.skipif(not native.available(), reason="native engine required")
@pytest.mark.parametrize("markers", [1, 3])
def test_stored_chain_native_matches_host(markers):
    pay, stream = _stored_chain_stream(markers=markers)
    body = stream[2:-4]
    hx = _build_index_host(body, len(pay), 256)
    nx = build_index(body, len(pay), 256)
    assert nx is not None
    assert np.array_equal(hx.bit_pos, nx.bit_pos)
    assert np.array_equal(hx.gap_off, nx.gap_off)
    assert np.array_equal(hx.gap_len, nx.gap_len)
    assert np.array_equal(hx.n_tokens, nx.n_tokens)


def test_empty_dynamic_flush_blocks_fold():
    pay, stream = _empty_dyn_stream()
    body = stream[2:-4]
    ix = _build_index_host(body, len(pay), 256)
    assert ix is not None, "empty flush blocks must fold into the jump"
    eng = CheckpointInflator(ob=256, backend="xla")
    got = eng.inflate_zlib_batch([stream], len(pay))
    assert np.asarray(got)[0].tobytes() == pay


@pytest.mark.skipif(not native.available(), reason="native engine required")
def test_empty_dynamic_native_matches_host():
    pay, stream = _empty_dyn_stream()
    body = stream[2:-4]
    hx = _build_index_host(body, len(pay), 256)
    nx = build_index(body, len(pay), 256)
    assert nx is not None
    assert np.array_equal(hx.bit_pos, nx.bit_pos)
    assert np.array_equal(hx.eob_jump, nx.eob_jump)
    assert np.array_equal(hx.n_tokens, nx.n_tokens)
    assert hx.n_blocks == nx.n_blocks


def test_spix_v4_serialization_roundtrip():
    pay, stream = _stored_chain_stream(markers=2)
    ix = _build_index_host(stream[2:-4], len(pay), 256)
    data = ix.serialize()
    assert data[0] == 4
    back = CheckpointIndex.parse(data)
    assert np.array_equal(back.gap_off, ix.gap_off)
    assert np.array_equal(back.gap_len, ix.gap_len)
    assert np.array_equal(back.bit_pos, ix.bit_pos)
    assert np.array_equal(back.pair_steps, ix.pair_steps)


def _flush_chain_stream(step: int, n: int = 1 << 15):
    """Incompressible payload emitted with a Z_FULL_FLUSH every ``step``
    bytes: zlib stores each chunk, so one 256-byte unit's copy source is
    interrupted several times (index v5 multi-gap chains)."""
    import zlib

    rng = np.random.default_rng(7)
    pay = rng.integers(0, 255, n).astype(np.uint8).tobytes()
    co = zlib.compressobj(6)
    parts = []
    for i in range(0, n, step):
        parts.append(co.compress(pay[i:i + step]))
        parts.append(co.flush(zlib.Z_FULL_FLUSH))
    parts.append(co.flush())
    return pay, b"".join(parts)


def test_multi_gap_stored_chain_indexes_and_decodes():
    import zlib

    pay, stream = _flush_chain_stream(64)
    body = stream[2:-4]
    ix = build_index(body, len(pay), 256)
    assert ix is not None, "64-byte stored chains must index (v5)"
    assert ix.extra_gaps, "expected multi-gap units"
    assert max(len(v) for v in ix.extra_gaps.values()) >= 1
    for backend in ("xla", "pallas"):
        eng = CheckpointInflator(ob=256, backend=backend)
        out, adler = eng.run([body], [ix], keep_on_device=False)
        assert bytes(np.asarray(out)[0].tobytes()) == pay, backend
        assert int(adler[0]) == zlib.adler32(pay)


def test_multi_gap_serialization_v5_roundtrip():
    pay, stream = _flush_chain_stream(64)
    ix = build_index(stream[2:-4], len(pay), 256)
    assert ix is not None
    blob = ix.serialize()
    if ix.extra_gaps:
        assert blob[0] == 5
    back = CheckpointIndex.parse(blob)
    assert back.extra_gaps == ix.extra_gaps
    assert np.array_equal(back.gap_off, ix.gap_off)
    assert np.array_equal(back.gap_len, ix.gap_len)


@pytest.mark.skipif(not native.available(), reason="native engine required")
def test_multi_gap_native_defers_to_host():
    """The native walker returns the host-retry code on multi-gap chains
    and build_index transparently serves the v5 host index."""
    pay, stream = _flush_chain_stream(64)
    body = stream[2:-4]
    r = native.build_index(body, len(pay), 256)
    hx = _build_index_host(body, len(pay), 256)
    if hx is not None and hx.extra_gaps:
        assert r == "host-retry"
        assert build_index(body, len(pay), 256) is not None
