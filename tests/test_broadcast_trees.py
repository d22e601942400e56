"""Broadcast of shared Huffman state across a batch (SURVEY §2.4.3).

When batch-encoding similar images, one tree set built from the pooled
term frequencies is broadcast to every shard; each image's tokens pack
against the same tables (one header, identical per-block tables).  This
trades a little ratio for one tree build + table broadcast instead of B —
the analog of the reference's per-block ``DeflatorTables`` becoming
mesh-shared state.
"""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from swift_png_tpu.lz77.huffman import lengths_from_frequencies
from swift_png_tpu.ops.deflate import (_emit_tables,
                                       _write_block_header_and_tables,
                                       _append_bits, atoms_to_bytes,
                                       greedy_tokens, pack_bits, pack_terms,
                                       term_frequencies)


def encode_batch_shared_trees(payloads, level=6):
    """Encode a batch of equal-size buffers with ONE shared tree set."""
    from swift_png_tpu.lz77.checksums import adler32
    from swift_png_tpu.lz77.huffman import canonical_codes
    from swift_png_tpu.utils.bits import BitWriter, reverse_bits

    n = len(payloads[0])
    N = 1 << max(12, n.bit_length())
    toks = []
    for data in payloads:
        buf = np.zeros(N, np.uint8)
        buf[:n] = np.frombuffer(data, np.uint8)
        toks.append(greedy_tokens(jnp.asarray(buf), jnp.int32(n),
                                  t_cap=N, lazy=level >= 4))
    # pooled frequencies → one broadcast tree set
    freq = np.zeros(320, np.int64)
    for terms, valid, _ in toks:
        freq += term_frequencies(np.asarray(terms), np.asarray(valid))
    freq[256] = len(payloads)
    lit_l = lengths_from_frequencies(freq[:286], 15, force=True)
    dist_l = lengths_from_frequencies(freq[288:318], 15, force=False)
    tables = _emit_tables(lit_l, dist_l)

    streams = []
    for data, (terms, valid, _) in zip(payloads, toks):
        out = BitWriter()
        cmf = 0x78
        out.write_bytes(bytes([cmf, ~((cmf * 256) % 31) & 31]))
        lanes, nbits = pack_terms(terms, *tables)
        atoms, total = pack_bits(lanes, nbits, valid)
        _write_block_header_and_tables(out, lit_l, dist_l, True)
        _append_bits(out, atoms_to_bytes(np.asarray(atoms), int(total)),
                     int(total))
        lit_codes = canonical_codes(np.asarray(lit_l, np.int64))
        out.write(reverse_bits(int(lit_codes[256]), int(lit_l[256])),
                  int(lit_l[256]))
        out.pad_to_byte()
        streams.append(bytes(out.drain())
                       + adler32(data).to_bytes(4, "big"))
    return streams


def _batch(B=4, n=20_000):
    rng = np.random.default_rng(17)
    base = rng.integers(0, 64, 400, dtype=np.uint8)
    out = []
    for i in range(B):
        noise = rng.integers(0, 4, n, dtype=np.uint8)
        img = (np.tile(base, n // 400 + 1)[:n] + noise).astype(np.uint8)
        out.append(img.tobytes())
    return out


def test_shared_trees_roundtrip_and_ratio():
    from swift_png_tpu.ops.deflate import deflate_device

    payloads = _batch()
    shared = encode_batch_shared_trees(payloads, level=6)
    per_image = [deflate_device(p, level=6) for p in payloads]
    for data, s in zip(payloads, shared):
        assert zlib.decompress(s) == data
    shared_total = sum(map(len, shared))
    solo_total = sum(map(len, per_image))
    # similar images: the pooled tree costs only a little ratio
    assert shared_total <= solo_total * 1.05, (shared_total, solo_total)
    print(f"\nshared trees: {shared_total} vs per-image {solo_total} "
          f"({shared_total / solo_total * 100:.1f}%)")
