"""Intra-stream block decomposition: parallel segment compression.

SURVEY §2.4.2 / §5 "long-context": the codec's sequence parallelism.  The
input splits into fixed segments; each segment compresses *independently*
(window reset at segment boundaries — no cross-segment matches), so all
segments' match searches and bit-packings run as one batched device
program, shardable over a mesh.  The host performs the ordered gather of
the bit-aligned block bodies, and the stream checksum comes from the
per-segment Adler-32s via the associative combine
(``adler32_combine`` — replacing the reference's sequential
``StreamIntegral.update``, ``Sources/LZ77/Wrappers/LZ77.MRC32.swift:26``).

The decode side of block decomposition is the checkpoint-parallel
lockstep inflate (``ops/inflate_checkpoint.py``), which splits on output
units instead of blocks and needs no window reset at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lz77.checksums import adler32, adler32_combine
from ..lz77.huffman import lengths_from_frequencies
from ..ops.deflate import (_emit_tables, _write_block_header_and_tables,
                           _append_bits, atoms_to_bytes, greedy_tokens,
                           pack_bits, pack_terms, term_frequencies)

__all__ = ["deflate_segmented", "segment_tokens"]


@functools.partial(jax.jit, static_argnames=("t_cap", "lazy"))
def segment_tokens(seg_data: jnp.ndarray, seg_len: jnp.ndarray, *,
                   t_cap: int, lazy: bool):
    """Batched match search + parse over independent segments.

    ``seg_data``: ``(S, L)`` uint8 — one row per segment (zero-padded);
    sharding the leading axis over a mesh runs every segment's search on
    its own device.  Returns ``(terms (S, t_cap), valid (S, t_cap),
    counts (S,))``.
    """
    return jax.vmap(
        lambda d, n: greedy_tokens(d, n, t_cap=t_cap, lazy=lazy)
    )(seg_data, seg_len)


def deflate_segmented(data: bytes, level: int = 6, segments: int = 8,
                      mesh=None) -> bytes:
    """One-shot zlib deflate with device-parallel independent blocks.

    Each segment becomes one dynamic DEFLATE block (window reset at its
    start).  With ``mesh``, the segment axis is sharded across the mesh's
    devices.  The result is a standard single-member zlib stream; its
    Adler-32 is assembled from per-segment checksums with the associative
    combine rather than a serial pass.
    """
    from ..lz77.deflate import _write_stored_block
    from ..utils.bits import BitWriter

    n = len(data)
    out = BitWriter()
    cmf = 0x78
    flg = ~((cmf * 256) % 31) & 31
    out.write_bytes(bytes([cmf, flg]))
    if n < 3 or n < segments * 16:
        _write_stored_block(out, data, True)
        out.pad_to_byte()
        return bytes(out.drain()) + adler32(data).to_bytes(4, "big")

    lazy = level >= 4
    L = -(-n // segments)
    L = 1 << max(12, (L - 1).bit_length())  # pow2 ≥ segment length
    seg_len = np.minimum(L, np.maximum(0, n - np.arange(segments) * L))
    # re-pack: segments of exactly L bytes except the last
    nseg = int(np.count_nonzero(seg_len))
    seg = np.zeros((nseg, L), np.uint8)
    raw = np.frombuffer(data, np.uint8)
    for s in range(nseg):
        piece = raw[s * L : s * L + int(seg_len[s])]
        seg[s, : piece.size] = piece
    seg_d = jnp.asarray(seg)
    len_d = jnp.asarray(seg_len[:nseg].astype(np.int32))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        seg_d = jax.device_put(seg_d, NamedSharding(mesh, P(axis, None)))
        len_d = jax.device_put(len_d, NamedSharding(mesh, P(axis)))
    terms, valid, counts = segment_tokens(seg_d, len_d, t_cap=L, lazy=lazy)

    terms_h = np.asarray(terms)
    valid_h = np.asarray(valid)
    # per-segment trees + device bit packing, ordered gather on host
    parts = []
    for s in range(nseg):
        freq = term_frequencies(terms_h[s], valid_h[s])
        lit_l = lengths_from_frequencies(freq[:286], 15, force=True)
        dist_l = lengths_from_frequencies(freq[288:318], 15, force=False)
        tables = _emit_tables(lit_l, dist_l)
        lanes, nbits = pack_terms(terms[s], *tables)
        atoms, total = pack_bits(lanes, nbits, valid[s])
        parts.append((lit_l, dist_l, atoms_to_bytes(np.asarray(atoms),
                                                    int(total)),
                      int(total)))
    from ..lz77.huffman import canonical_codes
    from ..utils.bits import reverse_bits

    for s, (lit_l, dist_l, body, total) in enumerate(parts):
        final = s == nseg - 1
        _write_block_header_and_tables(out, lit_l, dist_l, final)
        _append_bits(out, body, total)
        lit_codes = canonical_codes(np.asarray(lit_l, np.int64))
        out.write(reverse_bits(int(lit_codes[256]), int(lit_l[256])),
                  int(lit_l[256]))
    out.pad_to_byte()

    # checksum: associative combine of per-segment Adler-32s
    total_adler = 1
    for s in range(nseg):
        piece = raw[s * L : s * L + int(seg_len[s])]
        total_adler = adler32_combine(total_adler, adler32(piece),
                                      piece.size)
    return bytes(out.drain()) + total_adler.to_bytes(4, "big")
