"""Device deflate kernels: bit packing vs. the host BitWriter, greedy
match search round-trips, and the device one-shot encoder."""

import zlib

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from swift_png_tpu.lz77.deflate import (RawDeflator, _pack_literal,
                                        _pack_match)
from swift_png_tpu.lz77.huffman import lengths_from_frequencies
from swift_png_tpu.ops import deflate as dev
from swift_png_tpu.utils.bits import BitWriter


def test_pack_bits_matches_bitwriter():
    rng = np.random.default_rng(0)
    n = 500
    nbits = rng.integers(1, 49, n).astype(np.int32)
    patterns = [int(rng.integers(0, 1 << int(b))) for b in nbits]
    # host oracle
    bw = BitWriter()
    for p, b in zip(patterns, nbits):
        bw.write(p, int(b))
    bw.pad_to_byte()
    want = bytes(bw.drain())
    # device: patterns as 16-bit lanes
    lanes = np.zeros((4, n), np.int32)
    for i, p in enumerate(patterns):
        for j in range(4):
            lanes[j, i] = (p >> (16 * j)) & 0xFFFF
    atoms, total = dev.pack_bits(jnp.asarray(lanes), jnp.asarray(nbits),
                                 jnp.ones(n, bool))
    got = dev.atoms_to_bytes(np.asarray(atoms), int(total))
    assert int(total) == int(nbits.sum())
    assert got == want[:len(got)]


def test_pack_terms_matches_host_block_body():
    # build a term list with the host encoder's own packers, emit the block
    # body both ways
    rng = np.random.default_rng(1)
    terms = []
    for _ in range(300):
        if rng.random() < 0.6:
            terms.append(_pack_literal(int(rng.integers(0, 256))))
        else:
            terms.append(_pack_match(int(rng.integers(3, 259)),
                                     int(rng.integers(1, 32769))))
    freq = dev.term_frequencies(np.array(terms, np.uint32),
                                np.ones(len(terms), bool))
    ll = lengths_from_frequencies(freq[:286], 15, force=True)
    dl = lengths_from_frequencies(freq[288:318], 15, force=False)
    tables = dev._emit_tables(ll, dl)
    lanes, nbits = dev.pack_terms(jnp.asarray(np.array(terms, np.uint32)),
                                  *tables)
    atoms, total = dev.pack_bits(lanes, nbits, jnp.ones(len(terms), bool))
    got = dev.atoms_to_bytes(np.asarray(atoms), int(total))

    # host oracle: emit the same terms through the Python writer
    from swift_png_tpu.lz77 import constants as C
    from swift_png_tpu.lz77.huffman import canonical_codes
    from swift_png_tpu.utils.bits import reverse_bits

    lit_codes = canonical_codes(ll)
    dist_codes = canonical_codes(dl)
    bw = BitWriter()
    for term in terms:
        if term >> 27 == 31 and not term & 0x100:
            v = term & 0xFF
            bw.write(reverse_bits(int(lit_codes[v]), int(ll[v])), int(ll[v]))
        else:
            rd = term & 0xFF
            dd = term >> 27
            s = 257 + rd
            bw.write(reverse_bits(int(lit_codes[s]), int(ll[s])), int(ll[s]))
            if C.RUN_EXTRA[rd]:
                bw.write((term >> 9) & 0x1F, int(C.RUN_EXTRA[rd]))
            bw.write(reverse_bits(int(dist_codes[dd]), int(dl[dd])),
                     int(dl[dd]))
            if C.DISTANCE_EXTRA[dd]:
                bw.write((term >> 14) & 0x1FFF, int(C.DISTANCE_EXTRA[dd]))
    bw.pad_to_byte()
    want = bytes(bw.drain())
    assert got == want[:len(got)]


def _sample(n, seed=0, alphabet=16):
    rng = np.random.default_rng(seed)
    parts = []
    while sum(map(len, parts)) < n:
        if rng.random() < 0.5:
            parts.append(bytes(rng.integers(0, alphabet, rng.integers(1, 64),
                                            dtype=np.uint8)))
        else:
            parts.append(bytes([int(rng.integers(0, alphabet))])
                         * int(rng.integers(3, 200)))
    return b"".join(parts)[:n]


@pytest.mark.parametrize("n", [3, 100, 5000, 40000])
def test_deflate_device_roundtrip(n):
    data = _sample(n, seed=n)
    comp = dev.deflate_device(data)
    assert zlib.decompress(comp) == data


def test_deflate_device_compresses():
    data = _sample(30000, seed=2)
    comp = dev.deflate_device(data)
    # greedy-quality ratio: strictly compressed, within 2.2× of stdlib-6
    assert len(comp) < len(data)
    assert len(comp) < len(zlib.compress(data, 6)) * 2.2


def test_greedy_tokens_reconstruct():
    # decoding the produced terms must reproduce the input exactly
    data = _sample(4000, seed=5)
    N = 4096
    buf = np.zeros(N, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    terms, valid, count = dev.greedy_tokens(
        jnp.asarray(buf), jnp.int32(len(data)), t_cap=N)
    terms = np.asarray(terms)[np.asarray(valid)]
    out = bytearray()
    from swift_png_tpu.lz77 import constants as C
    for t in terms:
        t = int(t)
        if t >> 27 == 31 and not t & 0x100:
            out.append(t & 0xFF)
        else:
            rd = t & 0xFF
            dd = t >> 27
            run = int(C.RUN_BASE[rd]) + ((t >> 9) & 0x1F)
            dist = int(C.DISTANCE_BASE[dd]) + ((t >> 14) & 0x1FFF)
            for _ in range(run):
                out.append(out[-dist])
    assert bytes(out) == data


@pytest.mark.parametrize("n", [100, 5000])
def test_deflate_device_lazy_roundtrip(n):
    data = _sample(n, seed=n + 1)
    comp = dev.deflate_device(data, level=6)
    assert zlib.decompress(comp) == data


def test_lazy_not_worse_than_greedy():
    data = _sample(20000, seed=8)
    greedy = dev.deflate_device(data, level=3)
    lazy = dev.deflate_device(data, level=6)
    assert zlib.decompress(lazy) == data
    assert len(lazy) <= len(greedy) * 1.02


def test_deflate_device_power_of_two_input():
    # regression: a match ending exactly at n == buffer size N used to
    # clamp the jump target to N-1 and emit a spurious trailing literal
    rng = np.random.default_rng(7)
    half = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    data = half + half  # 4096 bytes, ends with a 2048-distance match
    out = dev.deflate_device(data, level=6)
    assert zlib.decompress(out) == data
    # control: one byte short of the boundary
    out2 = dev.deflate_device(data[:-1], level=6)
    assert zlib.decompress(out2) == data[:-1]


def test_pack_bits_match_heavy_no_truncation():
    # regression: natoms = 2n+8 silently dropped bits when terms averaged
    # more than 32 bits; 48-bit terms need 3n atoms
    n = 64
    nbits = np.full(n, 48, np.int32)
    rng = np.random.default_rng(1)
    patterns = [int(rng.integers(0, 1 << 48)) for _ in range(n)]
    bw = BitWriter()
    for p in patterns:
        bw.write(p & 0xFFFF, 16)
        bw.write((p >> 16) & 0xFFFF, 16)
        bw.write((p >> 32) & 0xFFFF, 16)
    bw.pad_to_byte()
    want = bytes(bw.drain())
    lanes = np.zeros((4, n), np.int32)
    for i, p in enumerate(patterns):
        for j in range(4):
            lanes[j, i] = (p >> (16 * j)) & 0xFFFF
    atoms, total = dev.pack_bits(jnp.asarray(lanes), jnp.asarray(nbits),
                                 jnp.ones(n, bool))
    got = dev.atoms_to_bytes(np.asarray(atoms), int(total))
    assert int(total) == 48 * n
    assert got == want[:len(got)]


def test_pack_bits32_quad_matches_pack_bits32():
    """Quad-combined packer is bit-exact vs the per-term 32-bit packer,
    including >64-bit groups (fallback path), dead lanes, and both span
    fallbacks."""
    rng = np.random.default_rng(7)
    for trial, spans in ((0, 2), (1, 3), (2, 3)):
        n = 1000 + trial  # exercise the %4 padding too
        if spans == 2:
            nbits = rng.integers(1, 34, n).astype(np.int32)
        else:
            # mix long (match-like) and short terms so many groups
            # exceed 64 bits and take the per-term fallback
            nbits = np.where(rng.random(n) < 0.5,
                             rng.integers(20, 49, n),
                             rng.integers(1, 13, n)).astype(np.int32)
        lo = np.zeros(n, np.int64)
        hi = np.zeros(n, np.int64)
        for i, b in enumerate(nbits):
            p = int(rng.integers(0, 1 << int(b)))
            lo[i] = p & 0xFFFFFFFF
            hi[i] = p >> 32
        valid = rng.random(n) < 0.9
        lo_j = jnp.asarray(lo.astype(np.uint32).view(np.int32))
        hi_j = jnp.asarray(hi.astype(np.uint32).view(np.int32))
        nb_j = jnp.asarray(nbits)
        vm_j = jnp.asarray(valid)
        ref_atoms, ref_total = dev.pack_bits32(lo_j, hi_j, nb_j, vm_j,
                                               spans=3)
        got_atoms, got_total = dev.pack_bits32_quad(lo_j, hi_j, nb_j,
                                                    vm_j, spans=spans)
        assert int(ref_total) == int(got_total)
        ref = dev.atoms32_to_bytes(np.asarray(ref_atoms), int(ref_total))
        got = dev.atoms32_to_bytes(np.asarray(got_atoms), int(got_total))
        assert got == ref
