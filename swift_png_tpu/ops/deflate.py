"""Device deflate kernels: token emission, parallel bit packing, and the
greedy match search.

The reference packs bits serially through a 16-bit atom accumulator
(``LZ77.DeflatorOut.append``, ``Sources/LZ77/Deflator/LZ77.DeflatorOut.
swift:105-147``) and walks hash chains per position
(``LZ77.DeflatorWindow.match``, ``…Window.swift:115-212``).  Both are
reformulated as data-parallel passes:

* **bit packing** — every term's full bit pattern (literal code, or
  length code + extra + distance code + extra, ≤ 48 bits) is synthesized
  independently as four 16-bit lanes; a prefix sum over bit lengths yields
  each term's output offset; eight scatter-adds land the (bit-disjoint)
  16-bit atom fragments.  Everything stays inside int32 — no 64-bit math.
* **match search** — 4-byte keys for all positions at once, candidates from
  a sort by (key, position) (the device analog of the F14 hash table +
  chain walk: a position's nearest chain predecessors are its neighbors in
  the sorted order), vectorized LCP via chunked 4-byte compares, and the
  greedy parse extracted with the same pointer-jump doubling as the
  inflate path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lz77 import constants as C
from ..lz77.huffman import canonical_codes, lengths_from_frequencies
from ..utils.bits import reverse_bits

__all__ = ["pack_bits", "pack_terms", "pack_stream", "greedy_tokens",
           "term_frequencies", "deflate_device"]

_RUN_EXTRA = jnp.asarray(C.RUN_EXTRA)
_RUN_BASE = jnp.asarray(C.RUN_BASE)
_DIST_EXTRA = jnp.asarray(C.DISTANCE_EXTRA)
_DIST_BASE = jnp.asarray(C.DISTANCE_BASE)
_RUN_DECADE = jnp.asarray(C.RUN_DECADE)
_DIST_DECADE = jnp.asarray(C.DISTANCE_DECADE)


def _place(lanes, piece, off):
    """OR a ≤16-bit ``piece`` into four 16-bit lanes at bit ``off`` (≤ 48).

    All arrays are int32; a piece spans at most two adjacent lanes.
    """
    lane = off >> 4
    sub = off & 15
    lo = (piece << sub) & 0xFFFF
    hi = piece >> (16 - sub)
    hi = jnp.where(sub == 0, 0, hi)
    out = []
    for j in range(4):
        contrib = jnp.where(lane == j, lo, 0) + jnp.where(lane == j - 1,
                                                          hi, 0)
        out.append(lanes[j] | contrib)
    return out


@jax.jit
def pack_terms(terms: jnp.ndarray, lit_bits, lit_len, dist_bits, dist_len):
    """Synthesize every term's full bit pattern.

    ``terms`` uses the host/reference packing (``LZ77.DeflatorTerm.swift``):
    literal = ``0xF8000000 | value``; match = ``dd<<27 | dist_extra<<14 |
    run_extra<<9 | 0x100 | rd``.

    Returns ``(lanes (4, n) int32 of 16 bits each, nbits (n,))``.
    """
    terms = terms.astype(jnp.uint32)
    is_lit = ((terms >> 27) == 31) & ((terms & 0x100) == 0)
    litv = (terms & 0xFF).astype(jnp.int32)
    rd = jnp.clip((terms & 0xFF).astype(jnp.int32), 0, 28)
    dd = jnp.clip((terms >> 27).astype(jnp.int32), 0, 29)
    run_extra_v = ((terms >> 9) & 0x1F).astype(jnp.int32)
    dist_extra_v = ((terms >> 14) & 0x1FFF).astype(jnp.int32)

    lanes = [jnp.zeros_like(litv) for _ in range(4)]
    sym = jnp.where(is_lit, litv, 257 + rd)
    # two gathers total: (bits | len<<16) packed per table — the six
    # separate small-table gathers cost ~20 ns each per term and
    # dominated the packer; the RFC 1951 extra-bit widths come from
    # their closed forms instead of tables
    lv = (lit_bits | (lit_len << 16))[sym]
    p0 = lv & 0xFFFF
    n0 = lv >> 16
    lanes = _place(lanes, p0, jnp.zeros_like(n0))
    off = n0
    # run extra bits (≤5), distance code (≤15), distance extra (≤13):
    # matches only — pieces are zero-width for literals
    reb = jnp.where(is_lit | (rd < 4) | (rd == 28), 0, (rd >> 2) - 1)
    lanes = _place(lanes, jnp.where(is_lit, 0, run_extra_v), off)
    off = off + reb
    dv = (dist_bits | (dist_len << 16))[dd]
    dn = jnp.where(is_lit, 0, dv >> 16)
    lanes = _place(lanes, jnp.where(is_lit, 0, dv & 0xFFFF), off)
    off = off + dn
    deb = jnp.where(is_lit | (dd < 4), 0, (dd >> 1) - 1)
    lanes = _place(lanes, jnp.where(is_lit, 0, dist_extra_v), off)
    nbits = off + deb
    return jnp.stack(lanes), nbits


@jax.jit
def pack_bits(lanes: jnp.ndarray, nbits: jnp.ndarray, valid: jnp.ndarray):
    """Pack variable-length LSB-first bit patterns into a byte stream.

    Args:
      lanes: ``(4, n)`` int32 — each term's pattern as 16-bit lanes.
      nbits: per-term bit counts (0…48 — a DEFLATE term's maximum;
        the 4-scatter placement below spans exactly
        ``ceil((15 + 48) / 16) = 4`` atoms and would drop bits past 48).
      valid: mask of live terms.

    Returns:
      ``(atoms (3n+8,) int32 of 16 bits each, total_bits)``.
    """
    n = nbits.shape[0]
    nb = jnp.where(valid, nbits, 0)
    offs = jnp.cumsum(nb) - nb
    total = jnp.sum(nb)
    # terms carry up to 48 bits, so the data atoms can reach index 3n + 3
    natoms = 3 * n + 8
    atoms = jnp.zeros(natoms, jnp.int32)
    a0 = offs >> 4
    sub = offs & 15
    # one scatter per SPANNED atom, not per (lane, half): atom a0+k takes
    # lane k's low part OR'd with lane k-1's spill — a term spans at most
    # ceil((15+48)/16) = 4 atoms.  Dead (lane, term) events route OUT OF
    # BOUNDS and are dropped — NOTE (round-4 re-measurement, PERF_NOTES):
    # dropped indices cost FULL price on this chip (~6.5-10 ns/index,
    # same as landed ones), so the win of this form over a (4, n) grid
    # is the smaller index COUNT (k · n for k spans), not event liveness.
    # This 16-bit packer is the validated reference; production routes
    # through pack_bits32 (32-bit atoms, half the indices).
    for k in range(4):
        lo = (lanes[k] << sub) & 0xFFFF
        spill = (jnp.where(sub == 0, 0, lanes[k - 1] >> (16 - sub))
                 if k > 0 else 0)
        val = lo | spill
        live = valid & (16 * k < sub + nb)
        atoms = atoms.at[jnp.where(live, a0 + k, natoms)].add(
            jnp.where(live, val, 0), mode="drop")
    return atoms, total


@jax.jit
def pack_stream(terms_u32, valid, lit_bits, lit_len, dist_bits, dist_len):
    """Fused term-synthesis + bit-packing (one dispatch per image: the
    per-image encode loop was paying two program launches and a
    materialized (4, n) lane intermediate per stream)."""
    lanes, nbits = pack_terms(terms_u32, lit_bits, lit_len,
                              dist_bits, dist_len)
    return pack_bits(lanes, nbits, valid)


def _place64(lo, hi, piece, off):
    """OR a ≤16-bit ``piece`` into a 64-bit (lo, hi int32) window at bit
    ``off`` (0…48)."""
    sh = off & 31
    in_hi = off >= 32
    shifted = piece << sh                      # low 32 bits of the shift
    spill = jnp.where(sh == 0, 0,
                      (piece >> 1) >> (31 - sh))  # high 32 bits
    lo = lo | jnp.where(in_hi, 0, shifted)
    hi = hi | jnp.where(in_hi, shifted, spill)
    return lo, hi


@jax.jit
def pack_terms32(terms: jnp.ndarray, lit_bits, lit_len, dist_bits,
                 dist_len):
    """:func:`pack_terms` variant emitting 32-bit halves.

    Returns ``(lo (n,), hi (n,), nbits (n,))`` int32 — each term's ≤48-bit
    pattern as two 32-bit words.  Feeds :func:`pack_bits32`, whose
    32-bit-atom scatter needs half the indices of the 16-bit packer
    (scatter cost on this chip is per INDEX — ~8 ns regardless of whether
    the event lands — so atom width, not event liveness, is the lever).
    """
    terms = terms.astype(jnp.uint32)
    is_lit = ((terms >> 27) == 31) & ((terms & 0x100) == 0)
    litv = (terms & 0xFF).astype(jnp.int32)
    rd = jnp.clip((terms & 0xFF).astype(jnp.int32), 0, 28)
    dd = jnp.clip((terms >> 27).astype(jnp.int32), 0, 29)
    run_extra_v = ((terms >> 9) & 0x1F).astype(jnp.int32)
    dist_extra_v = ((terms >> 14) & 0x1FFF).astype(jnp.int32)

    lo = jnp.zeros_like(litv)
    hi = jnp.zeros_like(litv)
    sym = jnp.where(is_lit, litv, 257 + rd)
    lv = (lit_bits | (lit_len << 16))[sym]
    lo, hi = _place64(lo, hi, lv & 0xFFFF, jnp.zeros_like(litv))
    off = lv >> 16
    reb = jnp.where(is_lit | (rd < 4) | (rd == 28), 0, (rd >> 2) - 1)
    lo, hi = _place64(lo, hi, jnp.where(is_lit, 0, run_extra_v), off)
    off = off + reb
    dv = (dist_bits | (dist_len << 16))[dd]
    dn = jnp.where(is_lit, 0, dv >> 16)
    lo, hi = _place64(lo, hi, jnp.where(is_lit, 0, dv & 0xFFFF), off)
    off = off + dn
    deb = jnp.where(is_lit | (dd < 4), 0, (dd >> 1) - 1)
    lo, hi = _place64(lo, hi, jnp.where(is_lit, 0, dist_extra_v), off)
    return lo, hi, off + deb


@functools.partial(jax.jit, static_argnames=("spans",))
def pack_bits32(lo, hi, nbits, valid, *, spans: int = 3):
    """Pack LSB-first bit patterns into 32-bit atoms.

    A ≤48-bit term at any bit offset spans at most 3 32-bit atoms, and at
    most 2 when its bit count is ≤ 33 — callers that can bound the max
    term bits from the Huffman trees (code length + decade extra bits over
    symbols that actually occur) pass ``spans=2`` and the scatter index
    count falls to 2n (~10 ns per scatter index on this chip; a round-4
    single-scatter wide-value variant measured SLOWER — the (natoms,
    spans) grid + dense fold cost more than the indices saved).

    Returns ``(atoms (⌈3n/2⌉+8,) int32 of 32 bits each, total_bits)``.
    """
    n = nbits.shape[0]
    nb = jnp.where(valid, nbits, 0)
    offs = jnp.cumsum(nb) - nb
    total = jnp.sum(nb)
    natoms = (3 * n) // 2 + 8
    atoms = jnp.zeros(natoms, jnp.int32)
    a0 = offs >> 5
    sub = offs & 31
    nsub = (32 - sub) & 31
    vals = [
        lo << sub,
        jnp.where(sub == 0, 0,
                  ((lo >> 1) & 0x7FFFFFFF) >> (nsub - 1)) | (hi << sub),
        jnp.where(sub == 0, 0, ((hi >> 1) & 0x7FFFFFFF) >> (nsub - 1)),
    ]
    for k in range(spans):
        live = valid & (32 * k < sub + nb)
        atoms = atoms.at[jnp.where(live, a0 + k, natoms)].add(
            jnp.where(live, vals[k], 0), mode="drop")
    return atoms, total


def _shift64(plo, phi, s):
    """Left-shift a 64-bit ``(plo, phi)`` int32 pair by ``s`` (0…63).

    Callers guarantee the shifted value still fits 64 bits (``phi`` is
    zero whenever ``s >= 32``); bits are logical (sign-safe via the
    mask-and-shift idiom used throughout the packers)."""
    sl = s & 31
    nsl = (32 - sl) & 31
    lo_sh = plo << sl
    carry = jnp.where(sl == 0, 0, ((plo >> 1) & 0x7FFFFFFF) >> (nsl - 1))
    big = s >= 32
    glo = jnp.where(big, 0, lo_sh)
    ghi = jnp.where(big, lo_sh, (phi << sl) | carry)
    return glo, ghi


@functools.partial(jax.jit, static_argnames=("spans",))
def pack_bits32_quad(lo, hi, nbits, valid, *, spans: int = 3):
    """Quad-combined 32-bit bit packer.

    Scatter cost on this chip is ~8 ns per scatter INDEX, so the lever is
    index count: four adjacent terms are first merged into one ≤64-bit
    payload with dense funnel shifts (elementwise, ~200× cheaper per byte
    than a scatter), and each *combinable* group (total bits ≤ 64) lands
    with 3 scatter passes over n/4 groups — 0.75·n indices instead of
    ``spans``·n.  Groups whose total exceeds 64 bits (≥2 long match terms
    adjacent — rare on real content) fall back to the per-term placement,
    masked to just those terms.  The prefix sum also shrinks 4×: group
    offsets come from the group-length cumsum, per-term offsets from the
    dense intra-group partials.

    ``spans`` bounds the per-TERM fallback placement exactly as in
    :func:`pack_bits32` (2 when the trees prove ≤ 33 bits per term).
    Bit-exact vs :func:`pack_bits32` by construction: every (term, bit)
    lands at the same absolute offset, and all placements are
    bit-disjoint so the scatter-adds compose.
    """
    n = nbits.shape[0]
    pad = (-n) % 4
    if pad:
        lo = jnp.concatenate([lo, jnp.zeros(pad, lo.dtype)])
        hi = jnp.concatenate([hi, jnp.zeros(pad, hi.dtype)])
        nbits = jnp.concatenate([nbits, jnp.zeros(pad, nbits.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    nb = jnp.where(valid, nbits, 0)
    plo = jnp.where(valid, lo, 0)
    phi = jnp.where(valid, hi, 0)
    n4 = nb.shape[0] // 4
    nb4 = nb.reshape(n4, 4)
    lo4 = plo.reshape(n4, 4)
    hi4 = phi.reshape(n4, 4)
    o1 = nb4[:, 0]
    o2 = o1 + nb4[:, 1]
    o3 = o2 + nb4[:, 2]
    gn = o3 + nb4[:, 3]
    comb = gn <= 64
    glo = lo4[:, 0]
    ghi = hi4[:, 0]
    for k, off in ((1, o1), (2, o2), (3, o3)):
        sl, sh = _shift64(lo4[:, k], hi4[:, k], off)
        glo = glo | sl
        ghi = ghi | sh
    goffs = jnp.cumsum(gn) - gn
    total = jnp.sum(gn)
    natoms = (3 * (n + pad)) // 2 + 8
    atoms = jnp.zeros(natoms, jnp.int32)
    # combinable groups: one ≤64-bit payload, 3 spans over n/4 indices
    a0g = goffs >> 5
    subg = goffs & 31
    nsubg = (32 - subg) & 31
    gvals = [
        glo << subg,
        jnp.where(subg == 0, 0,
                  ((glo >> 1) & 0x7FFFFFFF) >> (nsubg - 1)) | (ghi << subg),
        jnp.where(subg == 0, 0, ((ghi >> 1) & 0x7FFFFFFF) >> (nsubg - 1)),
    ]
    for k in range(3):
        live = comb & (32 * k < subg + gn) & (gn > 0)
        atoms = atoms.at[jnp.where(live, a0g + k, natoms)].add(
            jnp.where(live, gvals[k], 0), mode="drop")
    # fallback terms (group total > 64 bits): per-term placement
    toffs = (goffs[:, None]
             + jnp.stack([jnp.zeros_like(o1), o1, o2, o3], axis=1)
             ).reshape(-1)
    tlive = valid & ~jnp.repeat(comb, 4)
    a0 = toffs >> 5
    sub = toffs & 31
    nsub = (32 - sub) & 31
    vals = [
        plo << sub,
        jnp.where(sub == 0, 0,
                  ((plo >> 1) & 0x7FFFFFFF) >> (nsub - 1)) | (phi << sub),
        jnp.where(sub == 0, 0, ((phi >> 1) & 0x7FFFFFFF) >> (nsub - 1)),
    ]
    for k in range(spans):
        live = tlive & (32 * k < sub + nb)
        atoms = atoms.at[jnp.where(live, a0 + k, natoms)].add(
            jnp.where(live, vals[k], 0), mode="drop")
    return atoms, total


@functools.partial(jax.jit, static_argnames=("max_bits", "cap_words",
                                             "stop_group"))
def pack_tournament(lo, hi, nbits, valid, *, max_bits: int = 48,
                    cap_words: int | None = None,
                    stop_group: int | None = None):
    """Scatter-free bit packer: pairwise tournament merge of bitstrings.

    Scatter cost on this chip is per INDEX (~8 ns, largely liveness-
    independent), so packers built on scatter-adds pay O(n) indices no
    matter how the events are grouped.  This packer never scatters:
    adjacent terms merge pairwise — the right term's words are rolled by
    the left term's word count (log-decomposed static rolls) and funnel-
    shifted by its bit remainder, all dense elementwise passes — and
    ``log2(n)`` such levels yield ONE blob whose words are the output
    atoms.  The per-level buffers are sized by ``max_bits`` per term
    (pass 34-bit proofs from the trees via ``max_bits``) and clamped to
    ``cap_words`` (callers bound it by the actual output size, e.g. the
    uncompressed length — DEFLATE streams that expand are re-emitted as
    stored blocks anyway), which keeps the deep levels' roll traffic
    proportional to the real stream, not the worst case.

    Returns ``(atoms (cap,) int32 of 32 bits each, total_bits)``;
    bit-exact vs :func:`pack_bits32` (same LSB-first placement).
    """
    n = nbits.shape[0]
    np2 = 1 << max(0, (n - 1)).bit_length() if n > 1 else 1
    pad = np2 - n
    nb = jnp.where(valid, nbits, 0)
    wl = jnp.where(valid, lo, 0)
    wh = jnp.where(valid, hi, 0)
    if pad:
        nb = jnp.concatenate([nb, jnp.zeros(pad, nb.dtype)])
        wl = jnp.concatenate([wl, jnp.zeros(pad, wl.dtype)])
        wh = jnp.concatenate([wh, jnp.zeros(pad, wh.dtype)])
    words = jnp.stack([wl, wh], axis=1)            # (np2, 2)
    bits = nb
    group = 1
    while words.shape[0] > 1 and (stop_group is None
                                  or group < stop_group):
        group *= 2
        m = words.shape[0] // 2
        wn = -(-(group * max_bits) // 32) + 1
        if cap_words is not None:
            wn = min(wn, cap_words)
        wn = max(wn, words.shape[1])
        a = words[0::2]
        b = words[1::2]
        ab = bits[0::2]
        bb = bits[1::2]
        padw = wn - words.shape[1]
        if padw:
            z = jnp.zeros((m, padw), jnp.int32)
            a = jnp.concatenate([a, z], axis=1)
            b = jnp.concatenate([b, z], axis=1)
        # word-level shift of b by a's word count (static gated rolls;
        # live words never wrap: occupancy and shift are each ≤ wn/2
        # whenever the cap is not clamped, and clamped streams fit by
        # the caller's bound)
        sw = (ab >> 5)[:, None]
        k = 1
        while k < wn:
            b = jnp.where((sw & k) != 0, jnp.roll(b, k, axis=1), b)
            k <<= 1
        # bit-level funnel by the remainder
        sb = (ab & 31)[:, None]
        prev = jnp.concatenate([jnp.zeros((m, 1), jnp.int32), b[:, :-1]],
                               axis=1)
        carry = jnp.where(sb == 0, 0,
                          ((prev >> 1) & 0x7FFFFFFF) >> (31 - sb))
        words = a | (b << sb) | carry
        bits = ab + bb
    if words.shape[0] == 1:
        return words[0], bits[0]
    # scatter finish: each group's words land at its prefix-sum offset
    # (funnel-shifted by the sub-word remainder) — one scatter of
    # m·(W+1) indices instead of continuing the (increasingly wide)
    # dense rolls to the root
    m, W = words.shape
    goffs = jnp.cumsum(bits) - bits
    total = jnp.sum(bits)
    natoms = int(np2 * max_bits) // 32 + 8
    if cap_words is not None:
        natoms = min(natoms, cap_words + 8)
    sub = (goffs & 31)[:, None]
    prev = jnp.concatenate([jnp.zeros((m, 1), jnp.int32), words[:, :-1]],
                           axis=1)
    carry = jnp.where(sub == 0, 0,
                      ((prev >> 1) & 0x7FFFFFFF) >> (31 - sub))
    spans = jnp.concatenate(
        [(words << sub) | carry,
         jnp.where(sub == 0, 0,
                   ((words[:, -1:] >> 1) & 0x7FFFFFFF) >> (31 - sub))],
        axis=1)                                     # (m, W+1)
    widx = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    live = (widx * 32) < (sub + bits[:, None])
    tgt = jnp.where(live, (goffs >> 5)[:, None] + widx, natoms)
    atoms = jnp.zeros(natoms + 1, jnp.int32).at[tgt.reshape(-1)].add(
        jnp.where(live, spans, 0).reshape(-1), mode="drop")
    return atoms[:natoms], total


@jax.jit
def pack_stream32(terms_u32, valid, lit_bits, lit_len, dist_bits,
                  dist_len):
    """Fused 32-bit pack (3-span general form)."""
    lo, hi, nbits = pack_terms32(terms_u32, lit_bits, lit_len,
                                 dist_bits, dist_len)
    return pack_bits32(lo, hi, nbits, valid, spans=3)


@jax.jit
def pack_stream32_short(terms_u32, valid, lit_bits, lit_len, dist_bits,
                        dist_len):
    """Fused 32-bit pack for streams whose max term bits ≤ 33 (proved
    host-side from the trees): 2 scatter spans per term.

    Round-4 note: the quad-combined packer was re-measured SLOWER than
    the plain per-term scatter at 1M terms (38 vs 20 ms real — the
    group funnel's strided slicing relayouts cost more than the scatter
    indices they save), so both fused entries route plain."""
    lo, hi, nbits = pack_terms32(terms_u32, lit_bits, lit_len,
                                 dist_bits, dist_len)
    return pack_bits32(lo, hi, nbits, valid, spans=2)


def max_term_bits(lit_lengths, dist_lengths, freq) -> int:
    """Exact upper bound on a stream's per-term bit count, from the final
    trees and the symbol histogram (only decades that occur contribute)."""
    ll = np.asarray(lit_lengths, np.int64)
    dl = np.asarray(dist_lengths, np.int64)
    f = np.asarray(freq, np.int64)
    lit_max = int(np.max(np.where(f[:256] > 0, ll[:256], 0), initial=0))
    best = lit_max
    run_f = f[257:286]
    dist_f = f[288:318]
    if int(run_f.sum()) > 0 and int(dist_f.sum()) > 0:
        run_bits = np.where(run_f > 0,
                            ll[257:286] + np.asarray(C.RUN_EXTRA[:29]), 0)
        dist_bits_v = np.where(
            dist_f > 0,
            dl[:30] + np.asarray(C.DISTANCE_EXTRA[:30]), 0)
        best = max(best, int(run_bits.max()) + int(dist_bits_v.max()))
    return best


def atoms32_to_bytes(atoms: np.ndarray, total_bits: int) -> bytes:
    """Host: little-endian 32-bit atoms → the packed byte string."""
    u32 = np.asarray(atoms, np.int64).astype(np.uint32)
    return u32.tobytes()[: (int(total_bits) + 7) // 8]


def atoms_to_bytes(atoms: np.ndarray, total_bits: int) -> bytes:
    """Host: little-endian 16-bit atoms → the packed byte string."""
    u16 = np.asarray(atoms, np.int64).astype(np.uint16)
    return u16.tobytes()[: (int(total_bits) + 7) // 8]


def _emit_tables(lit_lengths: np.ndarray, dist_lengths: np.ndarray):
    """Host: LSB-first (bits, length) emit tables from code lengths."""
    lit_lengths = np.asarray(lit_lengths, np.int64)
    dist_lengths = np.asarray(dist_lengths, np.int64)
    lit_codes = canonical_codes(lit_lengths)
    dist_codes = canonical_codes(dist_lengths)

    def _rev_np(codes, lengths):
        # vectorized ≤15-bit reversal (the per-symbol Python loop cost
        # ~8 ms per call — material once called 8× per batched encode)
        rev8 = np.array([int(f"{i:08b}"[::-1], 2) for i in range(256)],
                        np.int64)
        r16 = (rev8[codes & 255] << 8) | rev8[(codes >> 8) & 255]
        return np.where(lengths > 0, r16 >> (16 - np.maximum(lengths, 1)),
                        0)

    lit_bits = _rev_np(lit_codes.astype(np.int64), lit_lengths)
    dist_bits = _rev_np(dist_codes.astype(np.int64), dist_lengths)
    pad = 288 - lit_bits.size
    if pad:
        lit_bits = np.concatenate([lit_bits, np.zeros(pad, np.int64)])
        lit_lengths = np.concatenate([lit_lengths, np.zeros(pad, np.int64)])
    dpad = 30 - dist_bits.size
    if dpad:
        dist_bits = np.concatenate([dist_bits, np.zeros(dpad, np.int64)])
        dist_lengths = np.concatenate([dist_lengths,
                                       np.zeros(dpad, np.int64)])
    # numpy, NOT device arrays: jit callers upload implicitly at call
    # time; eager jnp.asarray here both paid 4 host→device transfers
    # per call (each of which BLOCKS on this backend until the device
    # queue drains) and made host-side consumers pay device fetches
    return (lit_bits.astype(np.int32),
            lit_lengths.astype(np.int32),
            dist_bits.astype(np.int32),
            dist_lengths.astype(np.int32))


def term_frequencies(terms: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side symbol frequencies from packed terms."""
    t = terms[valid].astype(np.uint32)
    is_lit = (t >> 27 == 31) & ((t & 0x100) == 0)
    freq = np.zeros(320, np.int64)
    np.add.at(freq, np.where(is_lit, t & 0xFF, 257 + (t & 0xFF)), 1)
    np.add.at(freq, 288 + (t[~is_lit] >> 27), 1)
    freq[256] += 1
    return freq


def _stream_bits(terms: np.ndarray, valid: np.ndarray,
                 lit_lengths: np.ndarray, dist_lengths: np.ndarray) -> int:
    """Exact dynamic-block bit count for a term sequence (host).

    Token bits follow from the frequency tables alone (code length per
    symbol plus the decade's extra bits); the header cost reruns the same
    metaterm serialization the writer uses.
    """
    from ..lz77.deflate import _META_EXTRA, _metaterms

    freq = term_frequencies(terms, valid)
    ll = np.asarray(lit_lengths, np.int64)
    dl = np.asarray(dist_lengths, np.int64)
    bits = int(np.sum(freq[:286] * ll[:286]))
    bits += int(np.sum(freq[257:286] * np.asarray(C.RUN_EXTRA[:29])))
    dfreq = freq[288:318]
    bits += int(np.sum(dfreq[:dl.size] * dl))
    bits += int(np.sum(dfreq * np.asarray(C.DISTANCE_EXTRA[:30])))
    # header: HLIT/HDIST/HCLEN fields + code-length code + metaterms
    r = max(257, int(np.max(np.nonzero(ll)[0], initial=0)) + 1)
    used_d = np.nonzero(dl)[0]
    d = max(1, int(used_d.max()) + 1 if used_d.size else 1)
    sequence = [int(ll[s]) for s in range(r)] + [
        int(dl[s]) if s < dl.size else 0 for s in range(d)]
    meta = _metaterms(sequence)
    meta_freq = np.zeros(19, np.int64)
    for sym, _ in meta:
        meta_freq[sym] += 1
    meta_lengths = lengths_from_frequencies(meta_freq, 7, force=False)
    order_lengths = [int(meta_lengths[sym]) for sym in C.CODELENGTH_ORDER]
    hclen = 19
    while hclen > 4 and order_lengths[hclen - 1] == 0:
        hclen -= 1
    bits += 3 + 5 + 5 + 4 + 3 * hclen
    for sym, _ in meta:
        bits += int(meta_lengths[sym]) + _META_EXTRA.get(sym, 0)
    return bits


def _load32(db: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    i = jnp.clip(idx, 0, db.shape[0] - 4)
    return db[i] | db[i + 1] << 8 | db[i + 2] << 16 | db[i + 3] << 24


def _eq_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Matching low-byte count of a nonzero 4-byte XOR."""
    b0 = ((x & 0xFF) == 0).astype(jnp.int32)
    b1 = ((x & 0xFFFF) == 0).astype(jnp.int32)
    b2 = ((x & 0xFFFFFF) == 0).astype(jnp.int32)
    return b0 + b1 + b2


def _match_search(data: jnp.ndarray, n: jnp.ndarray, k: int,
                  max_chunks: int):
    """Best (run, dist) per position from sorted-neighbor candidates.

    Device analog of the F14 hash table + chain walk: a position's nearest
    chain predecessors are its neighbors in the (4-byte key, position)
    sorted order; the LCP is a chunked 4-byte compare.
    """
    N = data.shape[0]
    d32 = data.astype(jnp.uint32)
    db = jnp.concatenate([d32, jnp.zeros(4, jnp.uint32)])
    key = (db[:N] | db[1:N + 1] << 8 | db[2:N + 2] << 16 | db[3:N + 3] << 24)
    pos = jnp.arange(N, dtype=jnp.int32)
    live = pos < n - 3
    key = jnp.where(live, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    skey = key[order]

    # best (run, dist) per position via a combined scatter-max key:
    # run in the high bits, (32768 - dist) in the low bits so that among
    # equal runs the smaller distance wins (cheaper extra bits)
    best_comb = jnp.full(N, -1, jnp.int32)
    for back in range(1, k + 1):
        cand = jnp.roll(order, back)
        same = jnp.roll(skey, back) == skey
        this = order
        cand_pos = jnp.where(same, cand, -1)
        ok = (cand_pos >= 0) & (cand_pos < this) & (this - cand_pos < 32768)

        def lcp_step(chunk, state):
            run, alive = state
            a = _load32(db, this + 4 * chunk)
            b = _load32(db, jnp.where(alive, cand_pos, 0) + 4 * chunk)
            x = a ^ b
            eq = (x == 0) & alive
            add = jnp.where(eq, 4, _eq_bytes(x))
            return run + jnp.where(alive, add, 0), eq

        run, _ = jax.lax.fori_loop(
            1, max_chunks + 1, lcp_step, (jnp.full(N, 4, jnp.int32), ok))
        run = jnp.minimum(jnp.minimum(run, 258), n - this)
        combined = jnp.where(
            ok & (run >= 4),
            run * 65536 + (32768 - (this - cand_pos)), -1)
        best_comb = best_comb.at[this].max(combined)

    best_run = jnp.where(best_comb >= 0, best_comb >> 16, 0)
    best_dist = jnp.where(best_comb >= 0,
                          32768 - (best_comb & 0xFFFF), 0)
    return best_run, best_dist


@functools.partial(jax.jit,
                   static_argnames=("k", "t_cap", "max_chunks", "lazy",
                                    "min_run", "short_far"))
def greedy_tokens(data: jnp.ndarray, n: jnp.ndarray, *, k: int = 4,
                  t_cap: int, max_chunks: int = 31, lazy: bool = False,
                  min_run: int = 6, short_far: int = 0):
    """Greedy/lazy device match search over one buffer.

    Returns ``(terms (t_cap,), valid (t_cap,), count)`` — packed encode
    terms (match threshold run ≥ 6, mirroring ``DeflatorWindow.match``'s
    emit policy, ``…Window.swift:128-141``).  With ``lazy``, a position
    whose successor has a longer match emits literal+deferred-match like
    the reference's lazy strategy — every position's best match is already
    computed, so the lazy decision is a pure per-position function and the
    parse still extracts with rank pointer-jumping (a path node may carry
    two terms).  ``max_chunks`` caps the vectorized LCP at
    ``4 + 4·max_chunks`` bytes.  ``min_run``/``short_far`` relax the
    accept threshold to runs ≥ ``min_run`` at distances < ``short_far``
    (the native engine's short-cheap policy; callers race both policies
    and keep the smaller stream).
    """
    N = data.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    best_run, best_dist = _match_search(data, n, k, max_chunks)

    accept = best_run >= 6
    if short_far > 0:
        accept = accept | ((best_run >= min_run)
                           & (best_dist < short_far))
    take = accept & (pos + best_run <= n)
    if lazy:
        run_n = jnp.concatenate([best_run[1:], jnp.zeros(1, jnp.int32)])
        dist_n = jnp.concatenate([best_dist[1:], jnp.zeros(1, jnp.int32)])
        accept_n = jnp.concatenate([accept[1:], jnp.zeros(1, bool)])
        pair = (take & accept_n & (run_n > best_run)
                & (pos + 1 + run_n <= n) & (pos + 1 < n))
        step = jnp.where(pair, 1 + run_n, jnp.where(take, best_run, 1))
    else:
        pair = jnp.zeros(N, dtype=bool)
        run_n = dist_n = best_run  # unused
        step = jnp.where(take, best_run, 1)
    # past-the-end targets become fixed points at their own position so the
    # parse path never re-enters live data (callers guarantee N > n, but a
    # clamp to N-1 would otherwise alias a live position when n == N)
    nxt = jnp.where(pos + step >= n, pos, pos + step).astype(jnp.int32)
    nxt = jnp.where(pos >= n, pos, nxt)
    nxt = jnp.minimum(nxt, N - 1)

    ranks = jnp.arange(t_cap, dtype=jnp.int32)

    def jbody(kk, state):
        P, jump = state
        sel = (ranks >> kk) & 1
        P = jnp.where(sel == 1, jump[P], P)
        return P, jump[jump]

    K = max(1, (t_cap - 1).bit_length())
    P, _ = jax.lax.fori_loop(0, K, jbody,
                             (jnp.zeros(t_cap, jnp.int32), nxt))
    nvalid = P < n
    dup = jnp.concatenate([jnp.zeros(1, dtype=bool), P[1:] == P[:-1]])
    nvalid = nvalid & ~dup

    def match_term_at(run_v, dist_v):
        run_t = jnp.clip(run_v, 0, 258)
        dist_t = jnp.clip(dist_v, 0, 32768)
        rd_t = _RUN_DECADE[run_t]
        dd_t = _DIST_DECADE[dist_t]
        return ((dd_t.astype(jnp.uint32) << 27)
                | ((dist_t - _DIST_BASE[dd_t]).astype(jnp.uint32) << 14)
                | ((run_t - _RUN_BASE[rd_t]).astype(jnp.uint32) << 9)
                | 0x100 | rd_t.astype(jnp.uint32))

    lit_term = (jnp.uint32(0xF8000000)
                | data[jnp.clip(P, 0, N - 1)].astype(jnp.uint32))
    pair_n = pair[P] & nvalid
    is_match = take[P] & nvalid & ~pair_n
    term_a = jnp.where(is_match, match_term_at(best_run[P], best_dist[P]),
                       lit_term)
    # a lazy pair's second term is the deferred match at P+1
    term_b = match_term_at(run_n[P], dist_n[P])

    counts = jnp.where(nvalid, 1 + pair_n.astype(jnp.int32), 0)
    offs = jnp.cumsum(counts) - counts
    count = jnp.sum(counts)
    sink = t_cap  # scatter target for dead lanes
    terms = jnp.zeros(t_cap + 1, jnp.uint32)
    terms = terms.at[jnp.where(nvalid, offs, sink)].set(
        jnp.where(nvalid, term_a, 0))
    terms = terms.at[jnp.where(pair_n, offs + 1, sink)].set(
        jnp.where(pair_n, term_b, 0))
    terms = terms[:t_cap]
    tvalid = jnp.arange(t_cap) < count
    return terms, tvalid, count


def deflate_device(data: bytes, level: int = 3) -> bytes:
    """One-shot zlib deflate with the device match search + bit packing.

    Device: match search, greedy parse extraction, term bit synthesis,
    bit packing.  Host: Huffman tree construction from the (tiny)
    frequency table and dynamic-block header serialization — the same
    host/device split as the reference's table build vs. token hot loop.
    """
    from ..lz77.checksums import adler32
    from ..lz77.deflate import _write_stored_block
    from ..utils.bits import BitWriter

    if level >= 8:
        # full minimum-cost-path tier (DeflatorSearch levels 8–13)
        from .deflate_optimal import deflate_device_optimal

        return deflate_device_optimal(data, level=level)
    lazy = level >= 4  # level → strategy, matching DeflatorSearch tiers
    # sorted-neighbor candidate count scales with the level's search
    # budget (the device analog of DeflatorSearch attempts — more
    # neighbors in (key, pos) order = deeper chain walks)
    k = 4 if level <= 2 else (8 if level <= 5 else 16)
    n = len(data)
    out = BitWriter()
    cmf = 0x78
    flg = ~((cmf * 256) % 31) & 31
    out.write_bytes(bytes([cmf, flg]))
    if n < 3:
        _write_stored_block(out, data, True)
    else:
        N = 1 << max(12, (n - 1).bit_length())
        buf = np.zeros(N, np.uint8)
        buf[:n] = np.frombuffer(data, np.uint8)
        # race the reference accept policy (run >= 6) against the native
        # engine's short-cheap policy (run >= 4 at dist < 1024) and keep
        # the smaller stream — the match search itself is shared inside
        # one jitted call via common subexpressions, and the exact token
        # cost is computable host-side from the (tiny) frequency tables
        buf_d = jnp.asarray(buf)
        candidates = []
        for mr, sf in ((6, 0), (4, 1024)):
            terms_d, valid_d, _ = greedy_tokens(
                buf_d, jnp.int32(n), t_cap=N, lazy=lazy, k=k,
                min_run=mr, short_far=sf)
            terms = np.asarray(terms_d)
            valid = np.asarray(valid_d)
            freq = term_frequencies(terms, valid)
            ll = lengths_from_frequencies(freq[:286], 15, force=True)
            dl = lengths_from_frequencies(freq[288:318], 15, force=False)
            candidates.append((_stream_bits(terms, valid, ll, dl),
                               terms_d, valid_d, freq, ll, dl))
        _, terms_d, valid_d, freq, lit_lengths, dist_lengths = min(
            candidates, key=lambda c: c[0])
        tables = _emit_tables(lit_lengths, dist_lengths)
        lanes, nbits = pack_terms(terms_d, *tables)
        atoms, total = pack_bits(lanes, nbits, valid_d)
        body = atoms_to_bytes(np.asarray(atoms), int(total))
        _write_block_header_and_tables(out, lit_lengths, dist_lengths, True)
        _append_bits(out, body, int(total))
        lit_codes = canonical_codes(np.asarray(lit_lengths, np.int64))
        out.write(reverse_bits(int(lit_codes[256]), int(lit_lengths[256])),
                  int(lit_lengths[256]))
    out.pad_to_byte()
    return bytes(out.drain()) + adler32(data).to_bytes(4, "big")


def _write_block_header_and_tables(out, lit_lengths, dist_lengths,
                                   final: bool) -> None:
    """Dynamic block header + code-length tables (host serialization,
    identical policy to the Python tier's ``_write_dynamic_block``)."""
    from ..lz77.deflate import _META_EXTRA, _metaterms

    lit_lengths = np.asarray(lit_lengths, np.int64)
    dist_lengths = np.asarray(dist_lengths, np.int64)
    r = max(257, int(np.max(np.nonzero(lit_lengths)[0], initial=0)) + 1)
    used_d = np.nonzero(dist_lengths)[0]
    d = max(1, int(used_d.max()) + 1 if used_d.size else 1)
    sequence = [int(lit_lengths[s]) for s in range(r)] + [
        int(dist_lengths[s]) if s < dist_lengths.size else 0
        for s in range(d)]
    meta = _metaterms(sequence)
    meta_freq = np.zeros(19, np.int64)
    for sym, _ in meta:
        meta_freq[sym] += 1
    meta_lengths = lengths_from_frequencies(meta_freq, 7, force=False)
    meta_codes = canonical_codes(meta_lengths)
    order_lengths = [int(meta_lengths[sym]) for sym in C.CODELENGTH_ORDER]
    hclen = 19
    while hclen > 4 and order_lengths[hclen - 1] == 0:
        hclen -= 1
    out.write(1 if final else 0, 1)
    out.write(2, 2)
    out.write(r - 257, 5)
    out.write(d - 1, 5)
    out.write(hclen - 4, 4)
    for i in range(hclen):
        out.write(order_lengths[i], 3)
    for sym, extra in meta:
        out.write(reverse_bits(int(meta_codes[sym]), int(meta_lengths[sym])),
                  int(meta_lengths[sym]))
        eb = _META_EXTRA.get(sym, 0)
        if eb:
            out.write(extra, eb)


def _append_bits(out, body: bytes, nbits: int) -> None:
    """Append ``nbits`` LSB-first bits from ``body`` to the bit writer."""
    full, rem = divmod(nbits, 8)
    for i in range(full):
        out.write(body[i], 8)
    if rem:
        out.write(body[full] & ((1 << rem) - 1), rem)
