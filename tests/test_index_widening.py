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
