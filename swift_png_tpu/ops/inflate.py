"""Parallel DEFLATE inflate (TPU kernel tier).

The reference's inflate hot loop is bit-serial: each token's start position
depends on the previous token's length (``LZ77.InflatorBuffers.Stream.swift:
266-381``).  The TPU reformulation decomposes it into three massively
parallel stages plus a tiny serial host walk over block headers:

1. **Position-parallel token decode** — for *every* bit position ``p`` in
   the block window, speculatively decode one full token starting at ``p``
   (flat-LUT gathers, the device shape of ``InflatorTables``,
   ``LZ77.InflatorTables.swift:16-62``), producing ``next[p]`` (bit position
   after the token) and the token's fields.  ~8× redundant work, zero
   sequential dependency.
2. **Path extraction** — the true token sequence is the chain
   ``p0 → next[p0] → …``.  Positions of all ranks ``r`` are computed at once
   by binary decomposition of ``r`` over doubled jump tables; because powers
   of the same function compose commutatively, levels are applied in
   increasing order and overwritten in place (no O(nbits·log) level storage).
3. **LZ77 expansion** — each output byte either holds a literal (fixed
   point) or copies from ``j - distance``; pointer doubling
   (``ptr = ptr[ptr]``) resolves arbitrarily deep overlapping-copy chains
   (``LZ77.InflatorOut.expand`` forward-copy semantics,
   ``LZ77.InflatorOut.swift:124-139``) in ``log`` rounds.

The host walks block headers and builds the per-block decode LUTs (they
require decoding only ~hundreds of code-length symbols — the same split as
the reference's ``readBlockTables`` vs ``readBlock``).  Stored blocks
contribute literal fixed points directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lz77 import constants as C
from ..lz77.checksums import adler32
from ..lz77.errors import DecompressionError
from ..lz77.inflate import RawInflator, _Starved

__all__ = ["inflate", "inflate_blocks"]

# token kinds emitted by the position decoder
_LIT, _MATCH, _EOB, _BAD, _OVERFLOW = 0, 1, 2, 3, 4

_RUN_EXTRA = jnp.asarray(C.RUN_EXTRA)
_RUN_BASE = jnp.asarray(C.RUN_BASE)
_DIST_EXTRA = jnp.asarray(C.DISTANCE_EXTRA)
_DIST_BASE = jnp.asarray(C.DISTANCE_BASE)


def _pow2_at_least(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < n and b < hi:
        b <<= 1
    return b


@functools.partial(
    jax.jit,
    static_argnames=("win_words", "t_max", "lit_bits", "dist_bits"))
def _block_pass(W32: jnp.ndarray, start_bit: jnp.ndarray,
                litlut: jnp.ndarray, distlut: jnp.ndarray,
                *, win_words: int, t_max: int, lit_bits: int,
                dist_bits: int):
    """Decode one DEFLATE block's token stream.

    ``W32[i]`` is the little-endian 32-bit word at byte offset ``i`` of the
    compressed stream (≥25 valid bits at any bit phase).  Returns per-rank
    ``(positions, kind, runlit, dist, step)`` arrays of length ``t_max``;
    positions are relative to ``start_bit & ~7``.
    """
    start_byte = start_bit >> 3
    Wwin = jax.lax.dynamic_slice(W32, (start_byte,), (win_words,))
    nbits = win_words * 8 - 56  # keep all window fetches in-bounds

    p = jnp.arange(nbits, dtype=jnp.int32)

    def window(pos):
        w = Wwin[jnp.clip(pos >> 3, 0, win_words - 1)]
        return w >> (pos & 7).astype(jnp.uint32)

    w1 = window(p)
    e1 = litlut[(w1 & ((1 << lit_bits) - 1)).astype(jnp.int32)].astype(jnp.int32)
    l = e1 >> 16
    sym = e1 & 0xFFFF
    decade = jnp.clip(sym - 257, 0, 28)
    eb = _RUN_EXTRA[decade]
    run = _RUN_BASE[decade] + ((w1 >> l.astype(jnp.uint32)).astype(jnp.int32)
                               & ((1 << eb) - 1))
    p2 = p + l + eb
    w2 = window(p2)
    e2 = distlut[(w2 & ((1 << dist_bits) - 1)).astype(jnp.int32)].astype(jnp.int32)
    dl = e2 >> 16
    dsym = jnp.clip(e2 & 0xFFFF, 0, 29)
    db = _DIST_EXTRA[dsym]
    p3 = p2 + dl
    w3 = window(p3)
    dist = _DIST_BASE[dsym] + (w3.astype(jnp.int32) & ((1 << db) - 1))

    is_lit = (l > 0) & (sym < 256)
    is_eob = (l > 0) & (sym == 256)
    is_match = ((l > 0) & (sym >= 257) & (sym <= 285)
                & (dl > 0) & ((e2 & 0xFFFF) <= 29))
    step = jnp.where(is_lit | is_eob, l, l + eb + dl + db)
    nxt = p + step
    # a non-EOB token ending at/after the window edge leaves the next token
    # with no decoded position — the caller retries with a larger window
    overflow = nxt >= nbits
    kind = jnp.where(is_lit, _LIT,
                     jnp.where(is_match, _MATCH,
                               jnp.where(is_eob, _EOB, _BAD)))
    kind = jnp.where(overflow & (kind != _EOB), _OVERFLOW, kind)
    fixed = (kind == _EOB) | (kind == _BAD) | (kind == _OVERFLOW)
    nxt = jnp.where(fixed, p, nxt).astype(jnp.int32)
    runlit = jnp.where(is_lit, sym, run).astype(jnp.int32)

    # path extraction: P[r] = jump^r(p0) via binary decomposition of r.
    p0 = (start_bit & 7).astype(jnp.int32)
    P = jnp.full((t_max,), p0, jnp.int32)
    ranks = jnp.arange(t_max, dtype=jnp.int32)
    jump = nxt
    k = 0
    while (1 << k) < t_max:
        take = (ranks >> k) & 1
        P = jnp.where(take == 1, jump[P], P)
        if (1 << (k + 1)) < t_max:
            jump = jump[jump]
        k += 1
    return P, kind[P], runlit[P], dist[P], step[P]


def _expand_device(ptr: jnp.ndarray, lit: jnp.ndarray) -> jnp.ndarray:
    """Resolve back-reference chains by pointer doubling; literals are fixed
    points, so convergence is reached in ⌈log₂ max-chain⌉ rounds."""
    def cond(state):
        _, changed = state
        return changed

    def body(state):
        ptr, _ = state
        nxt = ptr[ptr]
        return nxt, jnp.any(nxt != ptr)

    ptr, _ = jax.lax.while_loop(cond, body, (ptr, jnp.bool_(True)))
    return lit[ptr]


_expand_jit = jax.jit(_expand_device)


class _Walker(RawInflator):
    """Block-header walker: reuses the host inflator's bit reader and table
    builder but never decodes token bodies (the device does)."""

    def __init__(self, data: bytes):
        super().__init__()
        self.push(data)


def inflate_blocks(data: bytes, out_size: int) -> np.ndarray:
    """Inflate a raw (headerless) DEFLATE stream of known output size.

    Host walks block headers; each Huffman block is one device pass; the
    final expansion is one device pass over the whole output.
    """
    walker = _Walker(data)
    nbytes = len(data)
    pad = np.zeros(8, np.uint8)
    D = np.concatenate([np.frombuffer(data, np.uint8), pad])
    W32 = (D[:nbytes + 1].astype(np.uint32)
           | D[1:nbytes + 2].astype(np.uint32) << 8
           | D[2:nbytes + 3].astype(np.uint32) << 16
           | D[3:nbytes + 4].astype(np.uint32) << 24)
    # pad W32 so any power-of-two window slice stays fully in bounds at any
    # start byte (lax.dynamic_slice clamps out-of-range starts, which would
    # silently shift the window).  max_words must exceed the stream by the
    # window's 56-bit safety margin, or valid blocks whose EOB falls within
    # the last few bytes of a power-of-two-sized stream become undecodable.
    max_words = _pow2_at_least(W32.size + 16, 1 << 10, 1 << 62)
    W32 = np.concatenate(
        [W32, np.zeros(2 * max_words - W32.size, np.uint32)])
    W32_dev = jnp.asarray(W32)

    ptr = np.arange(out_size, dtype=np.int64)
    lit = np.zeros(out_size, np.uint8)
    base = 0
    luts: dict[tuple, tuple] = {}

    while not walker.done:
        try:
            walker._read_block_header()
        except _Starved:
            raise DecompressionError.invalid_stream_checksum(0, 0) from None
        if walker._stored is not None:
            final, end = walker._stored
            length = end  # walker.out stays empty, so end == block length
            start = walker.bitpos >> 3
            if base + length > out_size or start + length > nbytes:
                raise DecompressionError.invalid_stream_checksum(0, 0)
            seg = np.frombuffer(data, np.uint8, length, start)
            lit[base:base + length] = seg
            base += length
            walker.bitpos += 8 * length
            walker._stored = None
            walker.done = bool(final)
            continue

        final, lit_list, lit_max, dist_list, dist_max = walker._block
        # key on object identity (the fixed tables are module-level
        # singletons) — the cache entry must keep the keyed list alive or a
        # freed list's id could be reused by a later block's fresh table
        key = id(lit_list)
        if key not in luts:
            luts[key] = (lit_list,
                         jnp.asarray(np.array(lit_list, np.int32)),
                         jnp.asarray(np.array(dist_list, np.int32)))
        _, litlut, distlut = luts[key]

        start_bit = walker.bitpos
        remaining_bits = 8 * nbytes - start_bit
        t_cap = out_size - base + 1
        # start with a window/rank budget sized for typical blocks (~16K
        # symbols, ≲128 KB compressed) and grow geometrically on demand —
        # bounded retries instead of worst-case allocations every block
        win_words = _pow2_at_least(
            min((remaining_bits >> 3) + 9, 1 << 17), 1 << 10, max_words)
        t_max = _pow2_at_least(min(t_cap, 1 << 15), 1 << 10, 1 << 62)
        while True:
            P, kind, runlit, dist, step = (np.asarray(x) for x in _block_pass(
                W32_dev, jnp.int32(start_bit), litlut, distlut,
                win_words=win_words, t_max=t_max, lit_bits=lit_max,
                dist_bits=dist_max))
            eobs = np.nonzero(kind == _EOB)[0]
            bad = np.nonzero((kind == _BAD) | (kind == _OVERFLOW))[0]
            if eobs.size and (not bad.size or bad[0] > eobs[0]):
                T = int(eobs[0])  # tokens before EOB
                break
            if bad.size and (not eobs.size or bad[0] < eobs[0]):
                if kind[bad[0]] == _OVERFLOW and win_words < max_words:
                    win_words = min(win_words * 4, max_words)
                    continue
                raise DecompressionError.invalid_huffman_table()
            # no EOB within t_max: tokens each produce ≥1 byte, so if t_max
            # already covers the remaining output budget the stream is bad
            if t_max >= t_cap:
                raise DecompressionError.invalid_stream_checksum(0, 0)
            t_max = _pow2_at_least(min(t_cap, t_max * 4), 1 << 10, 1 << 62)

        kind = kind[:T]
        runlit = runlit[:T]
        dist = dist[:T]
        outlen = np.where(kind == _LIT, 1, runlit).astype(np.int64)
        osz = int(outlen.sum())
        if base + osz > out_size:
            raise DecompressionError.invalid_stream_checksum(0, 0)
        if T:
            starts = base + np.cumsum(outlen) - outlen
            j = np.arange(base, base + osz, dtype=np.int64)
            t = np.searchsorted(starts, j, side="right") - 1
            m = kind[t] == _MATCH
            ptr[j] = np.where(m, j - dist[t], j)
            lit[j] = np.where(m, 0, runlit[t]).astype(np.uint8)
            if int(ptr[j].min(initial=0)) < 0:
                raise DecompressionError.invalid_string_reference()
        base += osz
        end_rel = int(P[T]) + int(step[T])  # EOB token's end position
        walker.bitpos = (start_bit & ~7) + end_rel
        walker._block = None
        walker.done = bool(final)

    if base != out_size:
        raise DecompressionError.invalid_stream_checksum(0, 0)
    out = np.asarray(_expand_jit(jnp.asarray(ptr.astype(np.int32)),
                                 jnp.asarray(lit)))
    return out


def inflate(data: bytes, out_size: int, format: str = "zlib") -> np.ndarray:
    """Inflate a complete ``zlib``/``ios`` stream of known output size on
    device; verifies the Adler-32 trailer for zlib."""
    if format == "zlib":
        if len(data) < 6:
            raise DecompressionError.invalid_stream_checksum(0, 0)
        cmf, flg = data[0], data[1]
        from ..lz77.errors import StreamHeaderError
        if cmf & 0x0F != 0x08:
            raise StreamHeaderError.invalid_compression_method(cmf & 0x0F)
        if (cmf * 256 + flg) % 31 != 0:
            raise StreamHeaderError.invalid_check_bits()
        if flg & 0x20:
            raise StreamHeaderError.unexpected_dictionary()
        body = data[2:]
        out = inflate_blocks(body, out_size)
        declared = int.from_bytes(data[-4:], "big")
        computed = adler32(out)
        if computed != declared:
            raise DecompressionError.invalid_stream_checksum(declared,
                                                             computed)
        return out
    if format == "ios":
        return inflate_blocks(data, out_size)
    raise ValueError(f"unknown format {format!r}")
