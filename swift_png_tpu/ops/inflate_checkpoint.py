"""Checkpoint-parallel device inflate: lockstep token decode over units.

The reference decodes one token at a time through a sequential bit cursor
(``Sources/LZ77/Inflator/LZ77.InflatorBuffers.Stream.swift:266-381``).
This engine is the TPU-native redesign: a stream's output is split into
fixed ``OB``-byte *units*, a :class:`~swift_png_tpu.lz77.index.
CheckpointIndex` records each unit's entry bit position (built for free at
encode time, or in one cheap host pass for foreign streams), and the
device then decodes *every unit of every stream in lockstep* — one token
per step across thousands of units, SPMD over the unit axis:

* the bit-window read is two 32-bit picks from the unit's dense span;
* Huffman decode is the closed-form canonical compare (15 threshold
  compares — no decode tables, replacing ``LZ77.InflatorTables``);
* tokens land at ``[step, unit]`` — no scatter anywhere;
* because every unit owns exactly ``OB`` output bytes, assembly is a pure
  reshape: per-byte token ids come from rank-counting compares against
  the per-unit output cumsum, never from a scatter;
* LZ77 back-references resolve by pointer doubling over the flat output,
  compacted to match bytes only (filtered image data is literal-heavy, so
  the compacted set is small).

Gather discipline (measured on TPU v5e: random access ≈ 13 ns/element,
dense ≈ 70 GB/s): the per-step gathers here touch ``units`` elements, not
``window`` elements — ~8 small gathers per *token* instead of the ~400
gather-elements per *byte* of a position-parallel design.  The Pallas
variant (``inflate_pallas.py``) removes even those by one-hot selects in
VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..lz77 import constants as C
from ..lz77.index import CheckpointIndex
from .inflate_fused import _canonical_params, _rev16, _adler_device

__all__ = ["decode_tokens", "inflate_indexed", "CheckpointInflator"]

_RUN_EXTRA = jnp.asarray(C.RUN_EXTRA)
_RUN_BASE = jnp.asarray(C.RUN_BASE)
_DIST_EXTRA = jnp.asarray(C.DISTANCE_EXTRA)
_DIST_BASE = jnp.asarray(C.DISTANCE_BASE)

F_BAD = 1


def _canon(rev15, T, first, offset, symbols):
    """Per-unit canonical decode: tables are rows of (U, ·) arrays."""
    l = jnp.ones_like(rev15)
    for k in range(1, 16):
        l = l + (rev15 >= T[:, k]).astype(jnp.int32)
    found = l <= 15
    ls = jnp.clip(l, 1, 15)
    code = rev15 >> (15 - ls)
    symidx = (jnp.take_along_axis(offset, ls[:, None], axis=1)[:, 0]
              + code
              - jnp.take_along_axis(first, ls[:, None], axis=1)[:, 0])
    symidx = jnp.clip(symidx, 0, symbols.shape[1] - 1)
    sym = jnp.take_along_axis(symbols, symidx[:, None], axis=1)[:, 0]
    return jnp.where(found, ls, 0), jnp.where(found, sym, 0)


def _pick2(spans, widx):
    """Two adjacent 32-bit words per unit → ≥32-bit LE window."""
    S = spans.shape[1]
    w0 = jnp.take_along_axis(spans, jnp.clip(widx, 0, S - 1)[:, None],
                             axis=1)[:, 0]
    w1 = jnp.take_along_axis(spans, jnp.clip(widx + 1, 0, S - 1)[:, None],
                             axis=1)[:, 0]
    return w0, w1


def _window32(spans, bitrel):
    widx = bitrel >> 5
    sub = (bitrel & 31).astype(jnp.uint32)
    w0, w1 = _pick2(spans, widx)
    hi = jnp.where(sub == 0, jnp.uint32(0), w1 << ((32 - sub) & 31))
    return (w0 >> sub) | hi


@functools.partial(jax.jit, static_argnames=("k_max",))
def decode_tokens(spans, sub0, n_tokens, lit_T, lit_first, lit_offset,
                  lit_symbols, dist_T, dist_first, dist_offset,
                  dist_symbols, *, k_max: int):
    """Lockstep token decode over all units.

    Args:
      spans: ``(U, S)`` uint32 — per-unit compressed windows (LE words).
      sub0: ``(U,)`` int32 — first token's bit offset within the span.
      n_tokens: ``(U,)`` int32 — tokens to decode per unit.
      lit_*/dist_*: per-unit canonical tables (rows broadcast per stream).
      k_max: static step count (≥ max(n_tokens)).

    Returns:
      ``(lens (k_max, U) int32, is_match (k_max, U) bool,
      aux (k_max, U) int32, flag (U,) int32, end_bitrel (U,) int32)`` —
      ``aux`` is the literal value or the match distance.
    """
    U = spans.shape[0]

    def body(k, carry):
        bitrel, flag, lens, ism, aux = carry
        active = k < n_tokens
        win = _window32(spans, bitrel)
        rev15 = _rev16((win & 0x7FFF).astype(jnp.int32)) >> 1
        l, sym = _canon(rev15, lit_T, lit_first, lit_offset, lit_symbols)
        dec = jnp.clip(sym - 257, 0, 28)
        eb = _RUN_EXTRA[dec]
        run = _RUN_BASE[dec] + (
            (win >> l.astype(jnp.uint32)).astype(jnp.int32) & ((1 << eb) - 1))
        win2 = _window32(spans, bitrel + l + eb)
        rev15d = _rev16((win2 & 0x7FFF).astype(jnp.int32)) >> 1
        dl, dsym = _canon(rev15d, dist_T, dist_first, dist_offset,
                          dist_symbols)
        dsafe = jnp.clip(dsym, 0, 29)
        db = _DIST_EXTRA[dsafe]
        dist = _DIST_BASE[dsafe] + (
            (win2 >> dl.astype(jnp.uint32)).astype(jnp.int32)
            & ((1 << db) - 1))
        is_lit = (l > 0) & (sym < 256)
        is_eob = (l > 0) & (sym == 256)
        is_mat = (l > 0) & (sym >= 257) & (sym <= 285) & (dl > 0) & (
            dsym <= 29)
        bad = active & ~(is_lit | is_eob | is_mat)
        step = jnp.where(is_lit, l, l + eb + dl + db)
        bitrel = bitrel + jnp.where(active & ~is_eob & ~bad, step, 0)
        tl = jnp.where(active & is_lit, 1,
                       jnp.where(active & is_mat, run, 0))
        ta = jnp.where(is_lit, sym, dist)
        lens = jax.lax.dynamic_update_slice(lens, tl[None], (k, 0))
        ism = jax.lax.dynamic_update_slice(
            ism, (active & is_mat)[None], (k, 0))
        aux = jax.lax.dynamic_update_slice(
            aux, jnp.where(active, ta, 0)[None], (k, 0))
        flag = flag | jnp.where(bad | (active & is_eob), F_BAD, 0)
        return bitrel, flag, lens, ism, aux

    init = (sub0, jnp.zeros(U, jnp.int32),
            jnp.zeros((k_max, U), jnp.int32),
            jnp.zeros((k_max, U), bool),
            jnp.zeros((k_max, U), jnp.int32))
    bitrel, flag, lens, ism, aux = jax.lax.fori_loop(0, k_max, body, init)
    return lens, ism, aux, flag, bitrel


@functools.partial(jax.jit, static_argnames=("ob", "n_streams", "out_size",
                                             "expand_cap", "k_max",
                                             "collapse", "records_cap",
                                             "interpret", "sweep_k"))
def inflate_indexed(spans, sub0, n_tokens, skip, lit_lengths, dist_lengths,
                    *, ob: int, n_streams: int, out_size: int,
                    expand_cap: int, k_max: int, collapse: bool = False,
                    records_cap: int | None = None,
                    interpret: bool = False,
                    sweep_k: int | None = None):
    """Full indexed inflate for ``n_streams`` same-size streams.

    Returns ``(out (B, out_size) uint8, flags (U,) int32, adler (B,)
    uint32, expand_overflow)``.  ``lit_lengths``/``dist_lengths`` are
    ``(B, 288)`` / ``(B, 32)`` per-stream code lengths (single-block
    streams only — multi-block batches route through the Pallas kernel's
    table-switching variant instead).
    """
    U = spans.shape[0]
    B = n_streams
    Ui = U // B

    def canon_b(lengths):
        lim, first, offset, symbols = jax.vmap(_canonical_params)(lengths)
        T = lim << (15 - jnp.arange(16, dtype=jnp.int32))[None, :]
        return T, first, offset, symbols

    lT, lF, lO, lS = canon_b(lit_lengths)
    dT, dF, dO, dS = canon_b(dist_lengths)
    rep = lambda x: jnp.repeat(x, Ui, axis=0)

    lens, ism, aux, flag, _ = decode_tokens(
        spans, sub0, n_tokens, rep(lT), rep(lF), rep(lO), rep(lS),
        rep(dT), rep(dF), rep(dO), rep(dS), k_max=k_max)

    # ---- assembly: per-unit token cumsum → per-byte token attribution --
    lens = lens.T  # (U, K)
    ism = ism.T
    aux = aux.T
    lens = lens.at[:, 0].add(-skip)  # first token partially owned
    cum = jnp.cumsum(lens, axis=1)  # (U, K) end offsets within unit
    K = cum.shape[1]
    b = jnp.arange(ob, dtype=jnp.int32)[None, :]
    # tid[u, b] = #tokens ending at or before byte b — two-level count:
    # whole groups of `seg` tokens via their end cumsums, then a scan of
    # the one partial group (cum is non-decreasing, so later groups
    # cannot contribute)
    G = 32
    seg = max(1, (K + G - 1) // G)
    cumg = cum[:, seg - 1::seg]  # (U, ≤G) group-end cumsums
    gsel = jnp.zeros((U, ob), jnp.int32)
    for g in range(cumg.shape[1]):
        gsel = gsel + (cumg[:, g][:, None] <= b).astype(jnp.int32)
    base = gsel * seg
    part = jnp.zeros((U, ob), jnp.int32)
    for j in range(seg):
        cj = jnp.take_along_axis(cum, jnp.clip(base + j, 0, K - 1), axis=1)
        part = part + ((cj <= b) & (base + j < K)).astype(jnp.int32)
    tid = jnp.clip(base + part, 0, K - 1)

    ism_b = jnp.take_along_axis(ism, tid, axis=1)
    aux_b = jnp.take_along_axis(aux, tid, axis=1)

    # flat output coordinates
    ustart = (jnp.arange(U, dtype=jnp.int32) // Ui) * (Ui * ob) + (
        jnp.arange(U, dtype=jnp.int32) % Ui) * ob
    j = ustart[:, None] + b  # (U, ob) flat position incl. padding
    Opad = Ui * ob
    live = (j % Opad) < out_size
    covered = b < cum[:, -1][:, None]
    valid = live & covered
    ptr = jnp.where(valid & ism_b, j - aux_b, j).reshape(-1)
    litv = jnp.where(valid & ~ism_b, aux_b, 0).reshape(-1).astype(jnp.uint8)
    flag = flag | jnp.where(
        jnp.any((ptr.reshape(U, ob) < (j - j % Opad)) & valid, axis=1),
        F_BAD, 0)
    flag = flag | jnp.where(jnp.any(live & ~covered, axis=1), F_BAD, 0)
    return _finish(ptr, litv, flag, B, Opad, out_size, expand_cap,
                   collapse=collapse, records_cap=records_cap,
                   interpret=interpret, sweep_k=sweep_k)


def _cumsum_mxu(x):
    """Exact prefix sum of a 0/1 int32 vector via a triangular matmul.

    XLA's native cumsum lowers to a long reduce-window chain; one
    (N/512, 512) × (512, 512) f32 matmul does the intra-block scan on the
    MXU instead (exact: counts stay < 2^24).  The inter-block offsets are
    a tiny host-size cumsum.
    """
    N = x.shape[0]
    BS = 512
    nb = (N + BS - 1) // BS
    xp = jnp.pad(x, (0, nb * BS - N)).reshape(nb, BS).astype(jnp.float32)
    tri = (jnp.arange(BS)[:, None] <= jnp.arange(BS)[None, :]).astype(
        jnp.float32)
    intra = jax.lax.dot_general(
        xp, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    tot = intra[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (intra + offs[:, None]).reshape(-1)[:N].astype(jnp.int32)


def _mod65521(x):
    """``x % 65521`` for 0 ≤ x < 2^31 without integer division.

    Quotient via f32 reciprocal multiply, then two conditional
    adjustments absorb the f32 rounding (|q error| ≤ 1).
    """
    q = jnp.floor(x.astype(jnp.float32) * (1.0 / 65521.0)).astype(jnp.int32)
    r = x - q * 65521
    r = jnp.where(r < 0, r + 65521, r)
    r = jnp.where(r >= 65521, r - 65521, r)
    r = jnp.where(r >= 65521, r - 65521, r)
    return r


def _adler_batch(out, out_size):
    """Adler-32 per row of ``(B, Opad)`` bytes — division-free, chunked.

    ``s2 = out_size + Σ (out_size - i)·d[i]``, with the weight reduced
    mod 65521 per element (product < 2^24·… stays in int32 after the
    weight mod) and sums folded every 64 elements.
    """
    B, Opad = out.shape

    def fold64(x):
        # 64-way fold with zero padding: intermediate levels are not
        # generally 64-divisible (e.g. Opad 1049088 → 16392)
        n = x.shape[1]
        npad = -(-n // 64) * 64
        if npad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((B, npad - n), x.dtype)], axis=1)
        return x.reshape(B, -1, 64).sum(axis=2)

    d = out.astype(jnp.int32)
    i = jnp.arange(Opad, dtype=jnp.int32)[None, :]
    live = i < out_size
    w = _mod65521(jnp.where(live, out_size - i, 0))
    p = jnp.where(live, w * d, 0)          # < 65521·255 < 2^24
    pc = _mod65521(fold64(p))              # < 2^30 before the mod
    s2 = out_size % 65521
    while pc.shape[1] > 1:
        if pc.shape[1] > 8192:
            pc = _mod65521(fold64(pc))
        else:
            pc = _mod65521(pc.sum(axis=1, keepdims=True))
    s2 = _mod65521(pc[:, 0] + s2)
    dc = fold64(jnp.where(live, d, 0))
    while dc.shape[1] > 1:
        if dc.shape[1] > 8192:
            dc = _mod65521(fold64(dc))
        else:
            dc = _mod65521(dc.sum(axis=1, keepdims=True))
    s1 = _mod65521(dc[:, 0] + 1)
    return (s2.astype(jnp.uint32) << 16) | s1.astype(jnp.uint32)


def _collapse_ptr(ptr):
    """Dense (gather-free) pointer collapse: same-distance runs + RLE.

    ``ptr[j] = j - d`` realizes the byte-by-byte forward copy of the
    reference's ``InflatorOut.expand`` (``…InflatorOut.swift:124-139``):
    a self-overlapping match (``run > dist``) chains ``ceil(run/d)``
    single steps deep — thousands on smooth-content images.  Two closed
    forms remove every *within-run* step before any gather happens:

    * a maximal contiguous region ``[s, e)`` where every byte copies
      from ``j - d`` (same ``d ≥ 2``) is equivalent to one virtual match
      token, so ``out[j] = out[s - d + (j - s) mod d]`` — the source is
      strictly before ``s`` (adjacent same-``d`` tokens merge safely:
      the copy semantics depend only on per-byte ``(j, d)``);
    * ``d == 1`` regions (RLE) all equal the value of the nearest
      non-RLE byte to the left — arbitrary-depth chains collapse to one
      hop to ``lastn1[j]``, the running max of non-RLE positions.

    After this rewrite, chain depth is bounded by the number of *tokens*
    in a dependency chain, not bytes, and d==1 bytes can be value-filled
    densely (no gathers at all) once everything else has resolved.

    Returns ``(ptr' (N,) int32, m1 (N,) bool)``.
    """
    N = ptr.shape[0]
    j = jnp.arange(N, dtype=jnp.int32)
    d = j - ptr                      # 0 = literal / dead
    is_m = d > 0
    m1 = d == 1
    lastn1 = jax.lax.cummax(jnp.where(m1, -1, j))
    dm = jnp.where(is_m & ~m1, d, 0)
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), dm[:-1]])
    start = (dm > 0) & (dm != prev)
    s = jax.lax.cummax(jnp.where(start, j, -1))
    o = j - s
    src2 = jnp.where(o < d, ptr, s - d + o % jnp.maximum(d, 1))
    ptr2 = jnp.where(m1, jnp.maximum(lastn1, 0),
                     jnp.where(is_m, src2, j))
    return ptr2, m1


def _fill_rle(out, m1, B, Opad):
    """Dense value fill of d==1 (RLE) bytes: each equals the nearest
    resolved byte to its left.  One packed ``(pos << 8) | value`` cummax
    per stream row — zero gathers (``Opad < 2^24`` so the key fits
    uint32; callers guarantee it by disabling collapse otherwise)."""
    o2 = out.reshape(B, Opad)
    m1r = m1.reshape(B, Opad)
    jl = jnp.arange(Opad, dtype=jnp.uint32)[None, :]
    key = jnp.where(m1r, jnp.uint32(0),
                    (jl << 8) | o2.astype(jnp.uint32))
    filled = jax.lax.cummax(key, axis=1)
    return jnp.where(m1r, (filled & 255).astype(jnp.uint8),
                     o2).reshape(-1)


def _expand_legacy(ptr, litv, expand_cap, seg_cap: int | None = None,
                   collapse_shape=None, chase: str = "heavy"):
    """Round-3 expansion (scatter-compaction): kept for A/B comparison.

    Compaction is two-level (measured: a flat N-sized scatter cost ~31 ms
    at N = 8.6 M — most of the decode tail): first the ``MATCH_SEG``-byte
    *segments* containing any match byte are compacted (an N/SEG-sized
    scatter + a row gather, both cheap), then the bytes within the
    gathered segments (a ``seg_cap·SEG``-sized scatter — the index counts
    match segments exactly, so ``seg_cap`` is tight).

    Returns ``(out (N,) uint8, ovf, cidx (expand_cap,) int32,
    src (expand_cap,) uint8)`` — ``cidx`` holds the flat positions of the
    match bytes (sentinel ``N`` in unused slots) and ``src`` their
    resolved values (the Adler combine needs both).

    ``collapse_shape``: static ``(B, Opad)`` enables the dense pointer
    collapse (:func:`_collapse_ptr`) — within-run chains resolve in
    closed form and d==1 (RLE) bytes are value-filled with zero gathers,
    shrinking both the compacted set and the doubling depth on
    match-heavy content.  In that mode ``cidx``/``src`` cover only the
    d≥2 match bytes, so callers must checksum from the output bytes
    (:func:`_adler_batch`), not from kernel literal partials.
    """
    from ..lz77.index import MATCH_SEG as SEG

    assert SEG == 64, "slot-rank bit masks assume 64-byte match segments"
    N = ptr.shape[0]
    if collapse_shape is not None and expand_cap >= (N >> 1):
        # identity-slot mode for match-DOMINATED content (smooth/RLE
        # images, match set ≈ the whole output): compacting buys nothing
        # — the pow2-padded slot set would be up to 2× the output — so
        # chase by pointer doubling over the flat array directly.  After
        # the collapse every pointer strictly decreases (literals are
        # fixpoints, RLE hops to the nearest non-RLE byte, within-run
        # chains are closed-form), so p ← p[p] converges in
        # ~log2(depth) rounds and the final values are one dense gather.
        ptr, _m1 = _collapse_ptr(ptr)

        def i_cond(st):
            _, ch = st
            return ch

        def i_body(st):
            p, _ = st
            nxt = p[p]
            return nxt, jnp.any(nxt != p)

        p, _ = jax.lax.while_loop(i_cond, i_body, (ptr, jnp.bool_(True)))
        out = litv[p]
        dummy = jnp.full(1, N, jnp.int32)
        return out, jnp.bool_(False), dummy, jnp.zeros(1, jnp.uint8)
    if collapse_shape is not None:
        Bc, Opadc = collapse_shape
        ptr, m1 = _collapse_ptr(ptr)
        is_m = (ptr != jnp.arange(N, dtype=jnp.int32)) & ~m1
    else:
        is_m = (ptr != jnp.arange(N, dtype=jnp.int32))
    Np = -(-N // SEG) * SEG
    nseg = Np // SEG
    if seg_cap is None:
        seg_cap = min(nseg, expand_cap)
    seg_cap = min(seg_cap, nseg)

    segm = jnp.pad(is_m.astype(jnp.uint8),
                   (0, Np - N)).reshape(nseg, SEG)
    seg_has = jnp.sum(segm.astype(jnp.int32), axis=1) > 0
    cs = _cumsum_mxu(seg_has.astype(jnp.int32))
    spos = cs - 1
    keep = seg_has & (spos < seg_cap)
    seg_ids = jnp.full(seg_cap, nseg, jnp.int32).at[
        jnp.where(keep, spos, seg_cap)
    ].set(jnp.where(keep, jnp.arange(nseg, dtype=jnp.int32), nseg),
          mode="drop")
    seg_ovf = jnp.sum(seg_has.astype(jnp.int32)) > seg_cap

    # gather the live segments' POINTER rows (row gathers are per-row
    # priced — measured ~100 ns/row regardless of width — so the values
    # ride along for free) and compact positions AND pointers in one
    # scatter pass: the first chase hop then needs no gather at all
    # (``ptr_pad[cidx]`` was a ~8 ms random gather into the full array)
    ptr2d = jnp.pad(ptr, (0, Np - N + SEG),
                    constant_values=0)  # +1 sentinel row
    ptr2d = (ptr2d.at[N:].set(jnp.arange(N, Np + SEG, dtype=jnp.int32))
             .reshape(nseg + 1, SEG))
    gptr = ptr2d[seg_ids]                               # (seg_cap, SEG)
    gidx = (seg_ids[:, None] * SEG
            + jnp.arange(SEG, dtype=jnp.int32)[None, :])
    flat_m = (gptr != gidx).reshape(-1)
    gidx = gidx.reshape(-1)
    gp = gptr.reshape(-1)
    cs2 = _cumsum_mxu(flat_m.astype(jnp.int32))
    pos2 = cs2 - 1
    keep2 = flat_m & (pos2 < expand_cap)
    tgt = jnp.where(keep2, pos2, expand_cap)  # out-of-bounds ⇒ dropped
    # one 2-wide scatter for (position, pointer) — scatter cost scales
    # with the index count, so merging halves it
    both = jnp.full((expand_cap, 2), N, jnp.int32).at[tgt].set(
        jnp.stack([jnp.where(keep2, gidx, N),
                   jnp.where(keep2, gp, N)], axis=-1), mode="drop")
    cidx = both[:, 0]
    p = both[:, 1]
    ptr_pad = jnp.concatenate([ptr, jnp.arange(N, N + 1, dtype=jnp.int32)])

    # light path (chase="light", non-default): a bounded single-step
    # chase over the compacted set.  Measured on chip: even for shallow
    # chains (depth 1-6 on filtered photographic data) the doubling path
    # converges in ~log2(depth)+1 rounds and wins — whole-tail 124.9 ms
    # light vs 97.7 ms heavy at B=32 — so "heavy" is the default and
    # this branch exists for A/B comparison.  Skipped statically when
    # the compacted set is at least half the output.
    def e_cond(st):
        _, i, changed = st
        return changed & (i < 12)

    def e_body(st):
        p, i, _ = st
        nxt = ptr_pad[jnp.clip(p, 0, N)]
        return nxt, i + 1, jnp.any(nxt != p)

    if chase == "light" and expand_cap < (N >> 1):
        p, _, unresolved = jax.lax.while_loop(
            e_cond, e_body, (p, jnp.int32(0), jnp.bool_(True)))
    else:
        unresolved = jnp.bool_(True)

    # heavy path: true pointer doubling over the compacted slot graph.
    # Deep chains (self-referential runs in smooth images) are thousands
    # of single steps — measured 2429 on a gradient test image — but only
    # ~log2(depth) doubling rounds.  Every match byte is a compacted slot
    # (overflow retries at a bigger cap), so a target is either a slot
    # (chase continues there) or a literal (encoded resolved, < 0).
    # Matches point strictly backward (dist >= 1) ⇒ acyclic ⇒ converges.
    #
    # A target's slot index is computed ARITHMETICALLY from the segment
    # structure — rank = (slots in kept segments before mine) + (slots
    # below my offset in my segment's packed bit mask) — instead of an
    # N-sized inverse map: the inv scatter plus the inv[p] gather each
    # paid the per-index random-access price on an N-sized table, while
    # the rank needs three gathers into nseg-sized tables plus dense
    # popcounts.  The ranked predicate must be EXACTLY the compaction's
    # ``flat_m`` (ptr != self within kept segments — in collapse mode
    # that includes RLE bytes sharing a segment with a d≥2 match, while
    # segment KEEP-ness comes from the d≥2 mask alone).
    full_m2 = jnp.pad((ptr != jnp.arange(N, dtype=jnp.int32)).astype(
        jnp.uint8), (0, Np - N)).reshape(nseg, SEG)
    full_m2 = full_m2 * keep[:, None].astype(jnp.uint8)
    mcnt = jnp.sum(full_m2.astype(jnp.int32), axis=1)
    mccum = _cumsum_mxu(mcnt) - mcnt               # exclusive prefix
    wsh = jnp.arange(32, dtype=jnp.uint32)[None, :]
    mask_lo = jnp.sum(full_m2[:, :32].astype(jnp.uint32) << wsh, axis=1,
                      dtype=jnp.uint32)
    mask_hi = jnp.sum(full_m2[:, 32:].astype(jnp.uint32) << wsh, axis=1,
                      dtype=jnp.uint32)
    # every random-access op on this chip pays a multi-ms dispatch floor
    # on 100K+-index sets, so the three per-segment rank tables are
    # interleaved into ONE flat table and fetched with one gather of 3·cap
    # indices instead of three cap-sized gathers
    rank_tab = jnp.stack(
        [mccum,
         jax.lax.bitcast_convert_type(mask_lo, jnp.int32),
         jax.lax.bitcast_convert_type(mask_hi, jnp.int32)],
        axis=1).reshape(-1)                        # (3·nseg,)

    def heavy(p_light):
        cap_ = p_light.shape[0]
        if collapse_shape is not None:
            # an RLE byte is not a compacted slot: hop through its (dense)
            # collapsed pointer first — the hop target is non-RLE by
            # construction (a literal or a d>=2 slot).  m1 rides the
            # pointer table's complement encoding so the hop is ONE
            # gather, not a mask gather plus a pointer gather.
            pc0 = jnp.clip(p_light, 0, N)
            m1_pad = jnp.concatenate([m1, jnp.zeros(1, bool)])
            cptr = jnp.where(m1_pad, ~ptr_pad, ptr_pad)
            v = cptr[pc0]
            p_light = jnp.where(v < 0, ~v, p_light)
        inb = (p_light >= 0) & (p_light < N)
        pc = jnp.clip(p_light, 0, Np - 1)
        s = pc >> 6                                # SEG == 64
        off = (pc & 63).astype(jnp.uint32)
        g3 = rank_tab[jnp.concatenate([3 * s, 3 * s + 1, 3 * s + 2])]
        base = g3[:cap_]
        lo = jax.lax.bitcast_convert_type(g3[cap_:2 * cap_], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(g3[2 * cap_:], jnp.uint32)
        offl = jnp.minimum(off, jnp.uint32(31))
        offh = jnp.minimum(off - 32, jnp.uint32(31))
        ml = jnp.where(off < 32, (jnp.uint32(1) << offl) - 1,
                       jnp.uint32(0xFFFFFFFF))
        mh = jnp.where(off < 32, jnp.uint32(0),
                       (jnp.uint32(1) << offh) - 1)
        cnt = (jax.lax.population_count(lo & ml)
               + jax.lax.population_count(hi & mh)).astype(jnp.int32)
        bit = jnp.where(off < 32, (lo >> offl) & 1, (hi >> offh) & 1)
        slot = base + cnt
        is_slot = inb & (bit == 1) & (slot < expand_cap)
        c = jnp.where(is_slot, slot, -p_light - 1)

        def h_cond(st):
            _, ch = st
            return ch

        def h_body(st):
            c, _ = st
            nxt = jnp.where(c >= 0, c[jnp.clip(c, 0, expand_cap - 1)], c)
            return nxt, jnp.any(nxt != c)

        c, _ = jax.lax.while_loop(h_cond, h_body, (c, jnp.bool_(True)))
        return -c - 1

    p = jax.lax.cond(unresolved, heavy, lambda _: p, p)
    out = litv
    src = out[jnp.clip(p, 0, N - 1)]
    # unused slots keep cidx == N: out of bounds ⇒ dropped (a clip-based
    # write would collide with a real write to byte N-1 and the scatter's
    # duplicate-index order is unspecified)
    out = out.at[cidx].set(src, mode="drop")
    if collapse_shape is not None:
        # fill only the live stream rows; global tail padding stays as-is
        head = _fill_rle(out[:Bc * Opadc], m1[:Bc * Opadc], Bc, Opadc)
        out = jnp.concatenate([head, out[Bc * Opadc:]])
    ovf = (jnp.sum(is_m) > expand_cap) | seg_ovf
    return out, ovf, cidx, jnp.where(cidx < N, src, 0)


def _fill_last(rows):
    """Forward-fill scattered rows: each row takes the nearest row at or
    before it whose first column is ≥ 0 (the scatter mark).  Associative
    take-last combine — log-depth dense passes, no gathers.  (A round-5
    radix-4 Hillis-Steele variant measured ~8 ms WORSE on the B=32
    expansion marginal — the explicit pad+concat passes lost to
    associative_scan's generated code — and was reverted.)"""
    def comb(a, b):
        return jnp.where(b[:, :1] >= 0, b, a)

    return jax.lax.associative_scan(comb, rows, axis=0)


def _select_bit(lo, hi, o):
    """Position of the ``o``-th set bit of the 64-bit mask ``(hi, lo)``.

    Dense popcount binary search (uint32 lanes) — garbage (but in-range)
    for out-of-range ``o``; callers mask by slot validity."""
    cl = jax.lax.population_count(lo).astype(jnp.int32)
    use_hi = o >= cl
    w = jnp.where(use_hi, hi, lo)
    oo = jnp.where(use_hi, o - cl, o)
    pos = jnp.where(use_hi, 32, 0)
    for width in (16, 8, 4, 2, 1):
        mask = jnp.uint32((1 << width) - 1)
        c = jax.lax.population_count(w & mask).astype(jnp.int32)
        go = oo >= c
        pos = pos + jnp.where(go, width, 0)
        oo = oo - jnp.where(go, c, 0)
        w = jnp.where(go, w >> width, w) & mask
    return pos


def _top_distances(d16, K: int, stride: int = 509):
    """Top-``K`` match distances by frequency, from a strided sample.

    All on device (one small sort + scatter-count — no host round trip);
    literals (distance 0) are excluded.  Returns ``(K,) int32`` padded
    with zeros when fewer distinct distances exist.
    """
    s = d16[::stride].astype(jnp.int32)
    ss = jnp.sort(s)
    n = ss.shape[0]
    start = jnp.concatenate([jnp.ones(1, bool), ss[1:] != ss[:-1]])
    sid = jnp.cumsum(start.astype(jnp.int32)) - 1
    counts = jnp.zeros(n, jnp.int32).at[sid].add(1)
    vals = jnp.zeros(n, jnp.int32).at[sid].max(ss)
    counts = jnp.where(vals > 0, counts, 0)
    idx = jnp.argsort(-counts)[:K]
    return jnp.where(counts[idx] > 0, vals[idx], 0)


def _expand_sweeps(ptr, litv, collapse_shape, resid_cap, seg_cap,
                   sweep_k: int, interpret: bool):
    """Distance-bucketed dense-shift expansion for match-RICH streams.

    Foreign encoders (zlib -9 class) emit ~50 % match bytes on
    photographic content — at that scale every per-match random-access
    op costs ~150+ ms, so the compacted chase and the records kernel
    both drown.  This mode spends DENSE passes instead: for each of the
    top-``sweep_k`` distances ``d`` (real content concentrates its
    distances: bpp strides, pitch multiples, small RLE periods), one
    ``dynamic_slice`` shift of the whole output by ``d`` plus a masked
    select resolves EVERY match byte of that distance whose source is
    already resolved — a ~0.3 ms pass over 33 MB versus ~150 ms of
    gathers.  Three sweeps cover the shallow chains (measured depth 1-6
    on photographic content); the residual (rare distances, deep
    chains) goes through the normal compacted machinery at a small cap.

    Reference semantics preserved: byte-by-byte forward copy
    (``LZ77.InflatorOut.swift:124-139``) — a byte only takes a value
    whose source byte is final, so placement order cannot matter.
    """
    N = ptr.shape[0]
    j = jnp.arange(N, dtype=jnp.int32)
    d = j - ptr
    d16 = d.astype(jnp.int16)
    dists = _top_distances(d16, sweep_k)
    resolved = d == 0
    out = litv
    PAD = 1 << 15

    def per_d(k, st):
        out, resolved = st
        dk = jax.lax.dynamic_slice(dists, (k,), (1,))[0]
        pout = jnp.concatenate([jnp.zeros(PAD, jnp.uint8), out])
        pres = jnp.concatenate([jnp.zeros(PAD, bool), resolved])
        so = jax.lax.dynamic_slice(pout, (PAD - dk,), (N,))
        sr = jax.lax.dynamic_slice(pres, (PAD - dk,), (N,))
        m = (d16 == dk.astype(jnp.int16)) & ~resolved & sr
        return jnp.where(m, so, out), resolved | m

    for _ in range(3):
        out, resolved = jax.lax.fori_loop(0, sweep_k, per_d,
                                          (out, resolved))
    # residual: resolved bytes become literals carrying their values;
    # the standard compacted path (collapse → RLE fill → rank hop →
    # chase) finishes the stragglers at a small cap
    residual_ptr = jnp.where(resolved, j, ptr)
    rseg = min(seg_cap, resid_cap) if seg_cap is not None else resid_cap
    return _expand(residual_ptr, out, resid_cap, rseg,
                   collapse_shape=collapse_shape, interpret=interpret)


def _expand(ptr, litv, expand_cap, seg_cap: int | None = None,
            collapse_shape=None, chase: str = "heavy",
            records_cap: int | None = None, interpret: bool = False,
            sweep_k: int | None = None, attr_flat=None, is_m_u8=None):
    """Compacted pointer-doubling expansion of LZ77 back-references.

    The round-3 compaction scattered every gathered-segment byte
    (``seg_cap·64`` indices ≈ 2 M at B=32 — measured ~10 ns/index, ~21 ms,
    half the expansion).  This version computes each compact slot's byte
    position ARITHMETICALLY instead: per-segment 64-bit match masks and
    slot-base prefix sums are built densely, kept-segment ids come from a
    64-grouped version of the same trick, per-slot segment rows are
    forward-filled with an associative scan (no gathers), and the byte
    offset is a popcount binary search (:func:`_select_bit`).  The only
    remaining random-access ops are O(slots)-index: one pointer gather,
    the rank hop, the chase rounds, and the final value scatter.

    Returns ``(out (N,) uint8, ovf, cidx (expand_cap,) int32,
    src (expand_cap,) uint8)`` — ``cidx`` holds the flat positions of the
    match bytes (sentinel ``N`` in unused slots) and ``src`` their
    resolved values (the Adler combine needs both).

    ``collapse_shape``: static ``(B, Opad)`` enables the dense pointer
    collapse (:func:`_collapse_ptr`) — within-run chains resolve in
    closed form and d==1 (RLE) bytes are value-filled with zero gathers.
    In that mode ``cidx``/``src`` cover only the d≥2 match bytes (plus
    RLE bytes sharing their segments), so callers must checksum from the
    output bytes (:func:`_adler_batch`), not from kernel literal partials.

    ``attr_flat``/``is_m_u8`` (non-collapse fast form): skip the N-sized
    int32 pointer materialization entirely — ``attr_flat`` is the
    decode kernel's attr buffer viewed flat (a FREE reshape of an
    existing HBM buffer; match ⇒ value = dist-1 ≥ 0) and ``is_m_u8`` the
    match mask.  The expansion's only pointer use outside the dense
    masks is the cap-sized gather at ``cidx``, so pointers are computed
    AT the gathered points: ``p = cidx - (attr[cidx] + 1)``.  Passing
    ``ptr=None`` with these saves a ~134 MB int32 operand write + read
    per batch.
    """
    from ..lz77.index import MATCH_SEG as SEG

    assert SEG == 64, "slot-rank bit masks assume 64-byte match segments"
    if attr_flat is not None:
        assert collapse_shape is None and ptr is None
        N = attr_flat.shape[0]
    else:
        N = ptr.shape[0]
    j = jnp.arange(N, dtype=jnp.int32)
    if collapse_shape is not None and sweep_k:
        # match-RICH foreign-style content: dense distance sweeps with
        # expand_cap acting as the RESIDUAL cap (see _expand_sweeps)
        return _expand_sweeps(ptr, litv, collapse_shape, expand_cap,
                              seg_cap, sweep_k, interpret)
    if collapse_shape is not None and expand_cap >= (N >> 1):
        # match-DOMINATED content (smooth/RLE images): sequential-copy
        # records kernel — exact forward-copy order, no chains, dense
        # row moves (inflate_seqcopy).  Falls back to the legacy flat
        # pointer-doubling when records don't apply (records_cap None,
        # unaligned Opad) or overflow their SMEM budget (caller retries
        # then drops records_cap).
        Bc0, Opadc0 = collapse_shape
        if records_cap is not None and Opadc0 % 128 == 0:
            from .inflate_seqcopy import build_records, seqcopy_expand

            N0 = Bc0 * Opadc0
            starts, recs, rovf = build_records(ptr, Bc0, Opadc0,
                                               records_cap)
            head = seqcopy_expand(starts, recs, litv[:N0], B=Bc0,
                                  Opad=Opadc0, interpret=interpret)
            out = jnp.concatenate([head, litv[N0:]])
            dummy = jnp.full(1, N, jnp.int32)
            return out, rovf, dummy, jnp.zeros(1, jnp.uint8)
        return _expand_legacy(ptr, litv, expand_cap, seg_cap,
                              collapse_shape, chase)
    if collapse_shape is not None:
        Bc, Opadc = collapse_shape
        ptr, m1 = _collapse_ptr(ptr)
        keep_b = (ptr != j) & ~m1
        is_m = ptr != j
    elif attr_flat is not None:
        m1 = None
        keep_b = is_m = is_m_u8 != 0
    else:
        m1 = None
        keep_b = is_m = ptr != j
    Np = -(-N // SEG) * SEG
    nseg = Np // SEG
    if seg_cap is None:
        seg_cap = min(nseg, expand_cap)
    seg_cap = min(seg_cap, nseg)

    # ---- dense per-segment tables (shared by compaction and the hop) --
    m2 = jnp.pad(is_m.astype(jnp.uint8), (0, Np - N)).reshape(nseg, SEG)
    k2 = jnp.pad(keep_b.astype(jnp.uint8), (0, Np - N)).reshape(nseg, SEG)
    seg_has = jnp.sum(k2.astype(jnp.int32), axis=1) > 0
    m2k = m2 * seg_has[:, None].astype(jnp.uint8)
    mcnt = jnp.sum(m2k.astype(jnp.int32), axis=1)
    mccum = _cumsum_mxu(mcnt) - mcnt               # exclusive slot base
    wsh = jnp.arange(32, dtype=jnp.uint32)[None, :]
    mask_lo = jnp.sum(m2k[:, :32].astype(jnp.uint32) << wsh, axis=1,
                      dtype=jnp.uint32)
    mask_hi = jnp.sum(m2k[:, 32:].astype(jnp.uint32) << wsh, axis=1,
                      dtype=jnp.uint32)
    total_slots = jnp.sum(mcnt)
    nkept = jnp.sum(seg_has.astype(jnp.int32))
    rank_tab = jnp.stack(
        [mccum,
         jax.lax.bitcast_convert_type(mask_lo, jnp.int32),
         jax.lax.bitcast_convert_type(mask_hi, jnp.int32)],
        axis=1).reshape(-1)                        # (3·nseg,)

    # ---- kept-segment ids: the same mask/rank trick one level up ----
    ngrp = -(-nseg // SEG)
    ghm = jnp.pad(seg_has.astype(jnp.uint32),
                  (0, ngrp * SEG - nseg)).reshape(ngrp, SEG)
    gcnt = jnp.sum(ghm.astype(jnp.int32), axis=1)
    gbase = _cumsum_mxu(gcnt) - gcnt
    glo = jnp.sum(ghm[:, :32] << wsh, axis=1, dtype=jnp.uint32)
    ghi = jnp.sum(ghm[:, 32:] << wsh, axis=1, dtype=jnp.uint32)
    gi = jnp.arange(ngrp, dtype=jnp.int32)
    gt = jnp.where(gcnt > 0, gbase, seg_cap)       # distinct for gcnt>0
    gvals = jnp.stack(
        [gi, gbase,
         jax.lax.bitcast_convert_type(glo, jnp.int32),
         jax.lax.bitcast_convert_type(ghi, jnp.int32)], axis=-1)
    grows = _fill_last(jnp.full((seg_cap, 4), -1, jnp.int32)
                       .at[gt].set(gvals, mode="drop"))
    ks = jnp.arange(seg_cap, dtype=jnp.int32)
    goff = _select_bit(
        jax.lax.bitcast_convert_type(grows[:, 2], jnp.uint32),
        jax.lax.bitcast_convert_type(grows[:, 3], jnp.uint32),
        ks - grows[:, 1])
    valid_k = ks < nkept
    seg_ids = jnp.where(valid_k, grows[:, 0] * SEG + goff, nseg)

    # ---- per-slot (segment, base, mask) rows: fill + bit-select ----
    sid_c = jnp.clip(seg_ids, 0, nseg - 1)
    g3 = rank_tab[jnp.concatenate([3 * sid_c, 3 * sid_c + 1,
                                   3 * sid_c + 2])]
    kbase = g3[:seg_cap]
    st = jnp.where(valid_k, kbase, expand_cap)     # distinct (mcnt ≥ 1)
    svals = jnp.stack([seg_ids, kbase, g3[seg_cap:2 * seg_cap],
                       g3[2 * seg_cap:]], axis=-1)
    srows = _fill_last(jnp.full((expand_cap, 4), -1, jnp.int32)
                       .at[st].set(svals, mode="drop"))
    ss = jnp.arange(expand_cap, dtype=jnp.int32)
    soff = _select_bit(
        jax.lax.bitcast_convert_type(srows[:, 2], jnp.uint32),
        jax.lax.bitcast_convert_type(srows[:, 3], jnp.uint32),
        ss - srows[:, 1])
    cidx = jnp.where(ss < total_slots,
                     jnp.minimum(srows[:, 0] * SEG + soff, N), N)
    if attr_flat is not None:
        # every real slot is a match byte, so its pointer is computed at
        # the gathered point from the kernel's attr buffer directly —
        # the N-sized int32 ptr array never exists
        cc = jnp.clip(cidx, 0, N - 1)
        a_g = attr_flat[cc].astype(jnp.int32)
        p = jnp.where(cidx >= N, N, cc - (a_g + 1))
    else:
        ptr_pad = jnp.concatenate([ptr,
                                   jnp.arange(N, N + 1, dtype=jnp.int32)])
        p = ptr_pad[jnp.clip(cidx, 0, N)]

    # ---- rank hop + pointer-doubling chase over the slot graph ----
    # (identical semantics to _expand_legacy's heavy path; matches point
    # strictly backward ⇒ acyclic ⇒ converges in ~log2(depth) rounds)
    def heavy(p_light):
        cap_ = p_light.shape[0]
        if collapse_shape is not None:
            pc0 = jnp.clip(p_light, 0, N)
            m1_pad = jnp.concatenate([m1, jnp.zeros(1, bool)])
            cptr = jnp.where(m1_pad, ~ptr_pad, ptr_pad)
            v = cptr[pc0]
            p_light = jnp.where(v < 0, ~v, p_light)
        inb = (p_light >= 0) & (p_light < N)
        pc = jnp.clip(p_light, 0, Np - 1)
        s = pc >> 6                                # SEG == 64
        off = (pc & 63).astype(jnp.uint32)
        g3h = rank_tab[jnp.concatenate([3 * s, 3 * s + 1, 3 * s + 2])]
        base = g3h[:cap_]
        lo = jax.lax.bitcast_convert_type(g3h[cap_:2 * cap_], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(g3h[2 * cap_:], jnp.uint32)
        offl = jnp.minimum(off, jnp.uint32(31))
        offh = jnp.minimum(off - 32, jnp.uint32(31))
        ml = jnp.where(off < 32, (jnp.uint32(1) << offl) - 1,
                       jnp.uint32(0xFFFFFFFF))
        mh = jnp.where(off < 32, jnp.uint32(0),
                       (jnp.uint32(1) << offh) - 1)
        cnt = (jax.lax.population_count(lo & ml)
               + jax.lax.population_count(hi & mh)).astype(jnp.int32)
        bit = jnp.where(off < 32, (lo >> offl) & 1, (hi >> offh) & 1)
        slot = base + cnt
        is_slot = inb & (bit == 1) & (slot < expand_cap)
        c = jnp.where(is_slot, slot, -p_light - 1)

        def h_cond(stc):
            _, ch = stc
            return ch

        def h_body(stc):
            c, _ = stc
            nxt = jnp.where(c >= 0, c[jnp.clip(c, 0, expand_cap - 1)], c)
            return nxt, jnp.any(nxt != c)

        c, _ = jax.lax.while_loop(h_cond, h_body, (c, jnp.bool_(True)))
        return -c - 1

    p = heavy(p)
    src = litv[jnp.clip(p, 0, N - 1)]
    out = litv.at[cidx].set(src, mode="drop")
    if collapse_shape is not None:
        head = _fill_rle(out[:Bc * Opadc], m1[:Bc * Opadc], Bc, Opadc)
        out = jnp.concatenate([head, out[Bc * Opadc:]])
    ovf = (total_slots > expand_cap) | (nkept > seg_cap)
    return out, ovf, cidx, jnp.where(cidx < N, src, 0)


def _finish(ptr, litv, flag, B, Opad, out_size, expand_cap,
            seg_cap: int | None = None, collapse: bool = False,
            records_cap: int | None = None, interpret: bool = False,
            sweep_k: int | None = None):
    """Shared tail: compacted pointer-doubling expansion + Adler-32."""
    out, ovf, _, _ = _expand(ptr, litv, expand_cap, seg_cap,
                             collapse_shape=(B, Opad) if collapse else None,
                             records_cap=records_cap, interpret=interpret,
                             sweep_k=sweep_k)
    out2 = out.reshape(B, Opad)
    adler = _adler_batch(out2, out_size)
    return out2[:, :out_size], flag, adler, ovf


def _probe_match_profile(body: bytes, max_tokens: int = 8000):
    """Host probe of a stream's match structure (one cheap partial walk).

    Returns ``(cov48, runs, match_bytes, out_bytes)`` — the fraction of
    match bytes covered by the 48 most frequent distances, the count of
    merged uniform-distance runs, and the bytes walked.  Drives the
    expansion-tier choice in :meth:`CheckpointInflator.run`: records
    kernel (few long runs), dense distance sweeps (many runs, few
    distinct distances), or the multithreaded native host tier (many
    runs at near-uniform distances — zlib -9 on noisy photographic
    content measures 18K+ distinct distances with top-48 coverage ~4 %,
    beyond any dense or random-access device strategy on this chip).
    """
    from ..lz77 import constants as CC
    from ..lz77.index import (FIXED_DIST_LENGTHS, FIXED_LIT_LENGTHS,
                              _BitWalker, _flat_lut,
                              _parse_dynamic_tables)

    w = _BitWalker(body)
    nbits = len(body) * 8
    hist: dict[int, int] = {}
    runs = 0
    match_bytes = 0
    out_bytes = 0
    prev_d = -1
    toks = 0
    try:
        while toks < max_tokens:
            if w.pos + 3 > nbits:
                break
            final = w.read(1)
            btype = w.read(2)
            if btype == 0:
                w.pos = (w.pos + 7) & ~7
                ln = w.read(16)
                w.read(16)
                w.pos += ln * 8
                out_bytes += ln
                if final:
                    break
                continue
            if btype == 1:
                lit = FIXED_LIT_LENGTHS.astype(np.int64)
                dist = FIXED_DIST_LENGTHS.astype(np.int64)
            else:
                lit, dist = _parse_dynamic_tables(w)
            litlut = _flat_lut(lit, 15).tolist()
            distlut = (_flat_lut(dist, 15).tolist()
                       if np.count_nonzero(dist) else [0, 0])
            while toks < max_tokens:
                e = litlut[w.peek(15)]
                l, sym = e >> 16, e & 0xFFFF
                if l == 0:
                    return None
                w.pos += l
                toks += 1
                if sym == 256:
                    break
                if sym < 256:
                    out_bytes += 1
                    prev_d = -1
                    continue
                dec = sym - 257
                if dec > 28:
                    return None
                run = int(CC.RUN_BASE[dec]) + w.read(int(CC.RUN_EXTRA[dec]))
                e2 = distlut[w.peek(15)]
                dl, dsym = e2 >> 16, e2 & 0xFFFF
                if dl == 0 or dsym > 29:
                    return None
                w.pos += dl
                d = int(CC.DISTANCE_BASE[dsym]) + w.read(
                    int(CC.DISTANCE_EXTRA[dsym]))
                hist[d] = hist.get(d, 0) + run
                match_bytes += run
                out_bytes += run
                if d != prev_d:
                    runs += 1
                prev_d = d
            else:
                break
            if final:
                break
    except Exception:
        return None
    if match_bytes == 0:
        return 1.0, runs, 0, max(out_bytes, 1)
    top = sorted(hist.values(), reverse=True)[:48]
    return sum(top) / match_bytes, runs, match_bytes, max(out_bytes, 1)


def _mulmod(a, b):
    """``a·b % 65521`` for 0 ≤ a, b < 65521 without int32 overflow.

    Split ``a = a1·256 + a0``: both partial products stay < 2^25.
    """
    a1 = a >> 8
    a0 = a & 255
    t = _mod65521(b << 8)
    return _mod65521(a1 * t + a0 * b)


def _modsum(x, chunk: int = 4096):
    """Σx % 65521 along the last axis, folding every ``chunk`` elements
    so partial sums stay < 2^31 (inputs must be < 65521)."""
    n = x.shape[-1]
    while n > chunk:
        pad = (-n) % chunk
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        x = _mod65521(xp.reshape(*x.shape[:-1], -1, chunk).sum(axis=-1))
        n = x.shape[-1]
    return _mod65521(x.sum(axis=-1))


def _segment_sums_mod(mv, prod, sid, valid, B):
    """Per-stream sums (mod 65521) of the match-byte corrections.

    A per-stream masked-reduction loop costs ``2·B`` dense passes over
    the compacted set (measured ~17 ms at B=32, cap 2^18); instead the
    values are bit-split so each part's segment sum stays exact in f32,
    and ONE MXU matmul against the stream one-hot does all streams at
    once.  ``mv`` < 2^8 and ``prod`` < 2^16; part width ``w`` is chosen
    so ``cap · (2^w - 1) < 2^24`` (f32 exact-integer range).  Falls back
    to the loop when the cap is so large that ``w`` < 4 (match-heavy
    content routes through ``_adler_batch`` instead anyway).
    """
    cap = mv.shape[0]
    w = 0
    while cap * ((1 << (w + 1)) - 1) < (1 << 24) and w < 16:
        w += 1
    if w < 4:
        a_cor = jnp.stack([_modsum(jnp.where(sid == s, mv, 0))
                           for s in range(B)])
        s2_cor = jnp.stack([_modsum(jnp.where(sid == s, prod, 0))
                            for s in range(B)])
        return a_cor, s2_cor
    parts = []
    weights = []
    for base, bits in ((mv, 8), (prod, 16)):
        nparts = -(-bits // w)
        for i in range(nparts):
            parts.append((base >> (w * i)) & ((1 << w) - 1))
            weights.append((1 << (w * i)) % 65521)
    P = len(parts)
    nmv = -(-8 // w)
    lhs = jnp.stack(parts).astype(jnp.float32)            # (P, cap)
    onehot = (sid[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]
              ) & valid[:, None]
    sums = jax.lax.dot_general(
        lhs, onehot.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (P, B) exact
    sums = _mod65521(sums.astype(jnp.int32))
    wv = jnp.asarray(weights, jnp.int32)[:, None]
    terms = _mulmod(jnp.broadcast_to(wv, (P, B)), sums)   # (P, B)
    a_cor = _mod65521(jnp.sum(terms[:nmv], axis=0))
    s2_cor = _mod65521(jnp.sum(terms[nmv:], axis=0))
    return a_cor, s2_cor


def _adler_from_partials(s1u, s2u, cidx, src, B, Ui, ob, Opad, out_size):
    """Combine per-unit literal partials + match-byte corrections.

    ``s1u/s2u``: ``(B, Ui)`` int32 — Σd and Σ(ob-b)·d over each unit's
    owned literal bytes (kernel outputs).  ``cidx/src``: the compacted
    match-byte positions/values from :func:`_expand`.  All arithmetic is
    int32-safe via modular folding (x64 is disabled under jit).
    """
    ul = jnp.arange(Ui, dtype=jnp.int32)
    # s2 contribution of a literal byte at stream offset p = ul·ob + b is
    # (out_size - p)·d = (out_size - (ul+1)·ob)·d + (ob - b)·d
    coef = _mod65521(out_size - (ul + 1) * ob + 65521)[None, :]
    s1m = _mod65521(s1u)
    a_lit = _modsum(s1m)
    s2_lit = _modsum(_mod65521(_mulmod(coef, s1m) + _mod65521(s2u)))

    valid = cidx < B * Opad
    p_local = jnp.where(valid, cidx, 0) % Opad
    sid = jnp.where(valid, cidx, 0) // Opad
    mval = src.astype(jnp.int32)
    wm = _mod65521(out_size - p_local)
    prod = jnp.where(valid, _mod65521(wm * mval), 0)
    mv = jnp.where(valid, mval, 0)
    a_cor, s2_cor = _segment_sums_mod(mv, prod, sid, valid, B)
    s1 = _mod65521(1 + a_lit + a_cor)
    s2 = _mod65521((out_size % 65521) + s2_lit + s2_cor)
    return (s2.astype(jnp.uint32) << 16) | s1.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("ob", "n_streams", "out_size",
                                             "expand_cap", "S",
                                             "interpret", "attr16",
                                             "seg_cap", "multiblock",
                                             "has_stored", "collapse",
                                             "chase", "records_cap",
                                             "sweep_k"))
def inflate_indexed_pallas(kbound, spans3, meta, tabs, symtab, *,
                           ob: int, n_streams: int, out_size: int,
                           expand_cap: int, S: int,
                           interpret: bool = False, attr16: bool = False,
                           seg_cap: int | None = None,
                           multiblock: bool = False,
                           has_stored: bool = False,
                           stored_gap=None, collapse: bool = False,
                           chase: str = "heavy",
                           records_cap: int | None = None,
                           sweep_k: int | None = None):
    """Indexed inflate with the Pallas decode+stamp kernel.

    Same contract as :func:`inflate_indexed`; the token decode,
    token→byte attribution, and the Adler-32 literal partial sums run in
    one VMEM kernel (``inflate_pallas.decode_stamp_pallas``), leaving
    only the back-reference expansion, the per-unit checksum combine, and
    the match-byte corrections to XLA.  Units carry per-lane tables, so
    streams need no tile alignment (``U_pad`` pads only the global tail).

    ``multiblock`` selects the table-switching kernel (units may cross
    one DEFLATE block boundary; ``meta`` row 3 carries the per-unit EOB
    jump).  ``has_stored`` enables the stored-unit byte fill:
    ``stored_gap`` is ``(2·NG, U_pad) int32`` — rows ``0…NG`` are gap
    offsets (row 0 is ``-1`` for token units, else the local offset
    where stored-block headers interrupt the copy source, ``>= ob`` for
    contiguous copies; later rows are ``ob`` when absent) and rows
    ``NG…2·NG`` the matching gap widths (5 per header crossed — flush
    markers between stored blocks stack; flush-heavy chains interrupt a
    unit several times, index v5).  Stored units' bytes are unpacked
    densely from their spans (no kernel work, no gathers).
    """
    from .inflate_pallas import SENTINEL, decode_stamp_pallas

    B = n_streams
    # the kernel emits attr already unit-major ((T, TUR, 128, ob)) — the
    # round-4 (0, 1, 3, 2) transpose here was a relayout-priced ~4 ms op
    attr4, kflag, s1k, s2k = decode_stamp_pallas(
        kbound, spans3, meta, tabs, symtab, S=S, ob=ob,
        interpret=interpret, attr16=attr16, multiblock=multiblock,
        transposed=True)
    U_pad = attr4.shape[0] * attr4.shape[1] * 128
    Ui = (out_size + ob - 1) // ob
    U_live = B * Ui
    Opad = Ui * ob
    attr = attr4.reshape(U_pad, ob)
    flag = kflag.reshape(U_pad)

    b = jnp.arange(ob, dtype=jnp.int32)[None, :]
    u = jnp.arange(U_pad, dtype=jnp.int32)[:, None]
    j = u * ob + b
    if Opad == out_size:
        # aligned streams (ob | out_size): every byte of a live unit is
        # live — skipping the (j % Opad) saves a 33 M-element integer
        # division by a non-pow2 modulus
        live = jnp.broadcast_to(u < U_live, (U_pad, ob))
    else:
        live = (u < U_live) & ((j % Opad) < out_size)
    ism_b = attr >= 0                       # match: attr = dist - 1
    is_lit = (attr < 0) & (attr != SENTINEL)
    a32 = attr.astype(jnp.int32)
    litv = jnp.where(live & is_lit, -a32 - 1, 0).astype(jnp.uint8)
    uncovered = attr == SENTINEL

    if has_stored:
        ng = stored_gap.shape[0] // 2
        goff = stored_gap[0]
        stored = (goff >= 0)[:, None]                   # (U_pad, 1)
        # dense byte unpack of each stored unit's span head; the copy
        # source skips every recorded gap (stored headers + any stacked
        # flush markers) at its recorded offset — cumulative over the
        # unit's up-to-NG gaps (index v5 multi-gap chains)
        spw = jnp.transpose(spans3, (0, 1, 3, 2)).reshape(U_pad, S)
        sb = jnp.stack([spw & 255, (spw >> 8) & 255,
                        (spw >> 16) & 255, (spw >> 24) & 255],
                       axis=-1).reshape(U_pad, S * 4).astype(jnp.uint8)
        idx = b
        for kg in range(ng):
            offk = stored_gap[kg]
            after = b >= jnp.where(offk >= 0, offk, ob)[:, None]
            idx = idx + jnp.where(after, stored_gap[ng + kg][:, None], 0)
        sbytes = jnp.take_along_axis(sb, idx, axis=1)
        litv = jnp.where(stored & live, sbytes, litv)
        uncovered = uncovered & ~stored
        # stored bytes are literals for the checksum: add their partials
        d = jnp.where(stored & live, sbytes.astype(jnp.int32), 0)
        s1k = s1k.reshape(U_pad) + jnp.sum(d, axis=1)
        s2k = s2k.reshape(U_pad) + jnp.sum((ob - b) * d, axis=1)

    litv = litv.reshape(-1)
    # stream base of unit u = (u // Ui)·Opad — per-unit, never a 33 M-
    # element modulus
    sbase = (u // Ui) * Opad
    flag = flag | jnp.where(
        jnp.any((j - (a32 + 1) < sbase) & live & ism_b, axis=1),
        F_BAD, 0)
    flag = flag | jnp.where(jnp.any(live & uncovered, axis=1), F_BAD, 0)
    # padding units report no flags (their kernel coverage bit is clear
    # because they own 0 bytes; mask anyway for the global tail)
    flag = jnp.where(u[:, 0] < U_live, flag, 0)

    if collapse:
        ptr = jnp.where(live & ism_b, j - (a32 + 1), j).reshape(-1)
        out, ovf, cidx, src = _expand(
            ptr, litv, expand_cap, seg_cap,
            collapse_shape=(B, Opad), chase=chase,
            records_cap=records_cap, interpret=interpret, sweep_k=sweep_k)
    else:
        # gather pointers lazily from the kernel's attr buffer (free
        # reshape) — the N-sized int32 ptr operand never materializes
        out, ovf, cidx, src = _expand(
            None, litv, expand_cap, seg_cap, chase=chase,
            records_cap=records_cap, interpret=interpret, sweep_k=sweep_k,
            attr_flat=attr4.reshape(-1),
            is_m_u8=(live & ism_b).astype(jnp.uint8).reshape(-1))
    out2 = out[:U_live * ob].reshape(B, Opad)
    if collapse:
        # cidx/src cover only d>=2 bytes here (RLE bytes were value-
        # filled densely), so checksum from the final bytes instead of
        # the kernel's literal partials
        adler = _adler_batch(out2, out_size)
    else:
        s1u = s1k.reshape(U_pad)[:U_live].reshape(B, Ui)
        s2u = s2k.reshape(U_pad)[:U_live].reshape(B, Ui)
        adler = _adler_from_partials(s1u, s2u, cidx, src, B, Ui, ob, Opad,
                                     out_size)
    return out2[:, :out_size], flag, adler, ovf


class CheckpointInflator:
    """Host wrapper: span slicing, bucketing, verification.

    One compiled program per (units, span, k_max, out_size) bucket.  The
    fast path serves any :class:`CheckpointIndex`-indexable stream —
    multi-block dynamic/fixed streams (per-unit table columns + boundary
    EOB jumps) and stored blocks (dense XLA byte fills) included; streams
    outside the index's structural limits belong to the general engines
    (``InflateFused`` / host / native tiers).
    """

    def __init__(self, ob: int = 1024, backend: str = "auto"):
        if backend == "auto":
            backend = "pallas" if jax.default_backend() not in (
                "cpu",) else "xla"
        self.backend = backend
        if backend == "pallas" and ob % 128 != 0:
            raise ValueError("pallas backend needs ob % 128 == 0")
        self.ob = ob

    @staticmethod
    def _pow2(n, lo=1):
        p = lo
        while p < n:
            p *= 2
        return p

    @staticmethod
    def auto_collapse(match_total: int, n_streams: int, out_size: int,
                      ui_pad: int, ob: int) -> bool:
        """Expansion-mode policy: match-heavy content (smooth/RLE-ish
        images) goes through the dense pointer collapse + RLE value
        fill; literal-heavy content keeps the cheaper literal-partial
        checksum path.  The RLE fill key packs ``(pos << 8) | byte`` in
        uint32, so the per-stream padded length must fit 24 bits."""
        return (match_total * 2 > n_streams * out_size
                and ui_pad * ob < (1 << 24))

    def prepare(self, bodies: list[bytes], indexes: list[CheckpointIndex]):
        """Slice per-unit spans to a dense device layout (host memcpy)."""
        from ..lz77.index import GAP_NONE, KIND_STORED
        from .inflate_pallas import TUB, prepare_block_tables

        multiblock = any(ix.multiblock for ix in indexes)
        pallas = self.backend == "pallas" or multiblock
        out_size = indexes[0].out_size
        ob = indexes[0].ob
        Ui = (out_size + ob - 1) // ob
        B = len(bodies)
        U_live = B * Ui
        U = -(-U_live // TUB) * TUB if pallas else U_live
        has_stored = any(ix.unit_kind.any() for ix in indexes)
        # v5 multi-gap stored chains: per-unit TOTAL skipped bytes bound
        # the span, and the gap table carries one (off, len) row pair per
        # gap rank present anywhere in the batch
        n_gaps = 1
        gmax = 5
        for ix in indexes:
            gmax = max(gmax, int(ix.gap_len.max()))
            if ix.extra_gaps:
                n_gaps = max(n_gaps,
                             1 + max(len(v) for v in ix.extra_gaps.values()))
                for u, ex in ix.extra_gaps.items():
                    gmax = max(gmax, int(ix.gap_len[u])
                               + sum(ln for _, ln in ex))
        span_bytes = max(ix.max_span_bytes() for ix in indexes)
        if has_stored:
            span_bytes = max(span_bytes, ob + 9 + gmax)
        if pallas:
            S = -(-((span_bytes + 3) // 4) // 8) * 8
        else:
            S = self._pow2((span_bytes + 3) // 4, 16)
        spans = np.zeros((U, S * 4), np.uint8)
        sub0 = np.zeros(U, np.int32)
        n_tokens = np.zeros(U, np.int32)
        psteps = np.zeros(U, np.int32)  # paired-step bounds (v3 indexes)
        skip = np.zeros(U, np.int32)
        nskip = np.zeros(U, np.int32)   # next unit's skip (same stream)
        owned = np.zeros(U, np.int32)
        jump = np.zeros(U, np.int32)
        sgap = np.full((n_gaps, U), -1, np.int32)
        sgap[1:] = ob          # rank-2+ gaps: ob = "never" for absent
        sglen = np.zeros((n_gaps, U), np.int32)
        tab_a = np.zeros(U, np.int64)   # per-unit block-table ids into the
        tab_b = np.zeros(U, np.int64)   # stacked all-streams table pool
        pool_lit: list[np.ndarray] = []
        pool_dist: list[np.ndarray] = []
        lit = np.zeros((B, 288), np.int32)
        dist = np.zeros((B, 32), np.int32)
        for i, (body, ix) in enumerate(zip(bodies, indexes)):
            assert ix.out_size == out_size and ix.ob == ob
            sb = (ix.bit_pos >> 3).astype(np.int64)
            buf = np.frombuffer(body, np.uint8)
            base = i * Ui
            # strided window view instead of a per-unit Python loop
            # (U can be 100k+) — no index matrix, no gathered temp;
            # reads past the body land in zero padding
            bufp = np.zeros(len(buf) + S * 4, np.uint8)
            bufp[: len(buf)] = buf
            spans[base: base + Ui] = np.lib.stride_tricks.\
                sliding_window_view(bufp, S * 4)[sb]
            sub0[base: base + Ui] = (
                ix.bit_pos - (sb << 3).astype(np.uint64)).astype(np.int32)
            n_tokens[base: base + Ui] = ix.n_tokens
            psteps[base: base + Ui] = (
                ix.pair_steps if ix.pair_steps is not None else ix.n_tokens)
            skip[base: base + Ui] = ix.skip
            nskip[base: base + Ui - 1] = ix.skip[1:]
            ow = np.minimum(ob, out_size - np.arange(Ui) * ob)
            st = ix.unit_kind == KIND_STORED
            # stored units skip the kernel entirely (owned 0 ⇒ inactive);
            # their bytes are unpacked densely on the XLA side
            owned[base: base + Ui] = np.where(st, 0, ow)
            jump[base: base + Ui] = ix.eob_jump.astype(np.int32)
            sgap[0, base: base + Ui] = np.where(
                st, np.where(ix.gap_off == GAP_NONE, ob,
                             ix.gap_off.astype(np.int32)), -1)
            sglen[0, base: base + Ui] = np.where(
                st & (ix.gap_off != GAP_NONE),
                ix.gap_len.astype(np.int32), 0)
            if ix.extra_gaps:
                for u, ex in ix.extra_gaps.items():
                    for kg, (goff, glen) in enumerate(ex, start=1):
                        sgap[kg, base + u] = goff
                        sglen[kg, base + u] = glen
            p0 = len(pool_lit)
            NBi = ix.n_blocks
            for bnum in range(NBi):
                pool_lit.append(ix.lit_lengths[bnum])
                pool_dist.append(ix.dist_lengths[bnum])
            tab_a[base: base + Ui] = p0 + ix.unit_block
            tab_b[base: base + Ui] = p0 + np.minimum(
                ix.unit_block + 1, NBi - 1)
            lit[i] = ix.lit_lengths[0]
            dist[i] = ix.dist_lengths[0]
        spans32 = spans.reshape(U, S, 4).astype(np.uint32)
        spans_w = (spans32[:, :, 0] | spans32[:, :, 1] << 8
                   | spans32[:, :, 2] << 16 | spans32[:, :, 3] << 24)
        prep = dict(out_size=out_size, ob=ob, B=B, Ui_pad=Ui, S=S,
                    multiblock=multiblock, has_stored=has_stored,
                    use_pallas=pallas)
        if pallas:
            Ur = U // 128
            T = U // TUB
            # transposed span layout: units on lanes, words on sublanes
            prep["spans3"] = jnp.asarray(np.ascontiguousarray(
                spans_w.reshape(T, TUB // 128, 128, S).transpose(0, 1, 3, 2)))
            mrows = [sub0, skip, owned] + ([jump] if multiblock else [])
            prep["meta"] = jnp.asarray(
                np.stack(mrows).reshape(len(mrows), Ur, 128))
            # per-unit table columns (tiles may mix streams/blocks); the
            # multiblock kernel also carries each unit's *next*-block
            # tables (switched to at the boundary EOB)
            tabsym = [prepare_block_tables(pool_lit[p], pool_dist[p])
                      for p in range(len(pool_lit))]
            tabs_all = np.stack([t[0] for t in tabsym])    # (P, 72)
            sym_all = np.stack([t[1] for t in tabsym])     # (P, 128)
            # trim the packed literal-symbol rows to the populated range:
            # non-lbad decodes always land at symidx < nlit, so the
            # kernel's one-hot scan needs only ceil(max nlit / 3) rows
            max_nlit = max(int(np.count_nonzero(pool_lit[p]))
                           for p in range(len(pool_lit)))
            rows3 = -(-max_nlit // 3)
            R = max(8, -(-rows3 // 8) * 8)
            sym_all = np.ascontiguousarray(sym_all[:, :R])
            ids_a = np.zeros(U, np.int64)
            ids_a[:U_live] = tab_a[:U_live]
            cols_t = tabs_all[ids_a]                       # (U, 72)
            cols_s = sym_all[ids_a]                        # (U, 128)
            if multiblock:
                ids_b = np.zeros(U, np.int64)
                ids_b[:U_live] = tab_b[:U_live]
                cols_t = np.concatenate(
                    [cols_t, tabs_all[ids_b]], axis=1)     # (U, 144)
                cols_s = np.concatenate(
                    [cols_s, sym_all[ids_b]], axis=1)      # (U, 256)
            tr = cols_t.shape[1]
            sr = cols_s.shape[1]
            prep["tabs"] = jnp.asarray(np.ascontiguousarray(
                cols_t.reshape(T, TUB // 128, 128, tr)
                .transpose(0, 3, 1, 2)))
            prep["symtab"] = jnp.asarray(np.ascontiguousarray(
                cols_s.reshape(T, TUB // 128, 128, sr)
                .transpose(0, 3, 1, 2)))
            kb = n_tokens.reshape(T, TUB).max(axis=1).astype(np.int32)
            pb = psteps.reshape(T, TUB).max(axis=1).astype(np.int32)
            # tile mode 1: every live unit is all-literal — n_tokens ==
            # owned with no skip on EITHER boundary forces 1-byte tokens
            # only (a fully-contained match contributes >= 3 bytes; a
            # tail-crossing match would leave skip > 0 on the next unit),
            # plus no EOB jump and no stored fill; such tiles run the
            # kernel's row-store fast loop (two literals per step)
            lit_ok = ((owned == 0)
                      | ((n_tokens == owned) & (skip == 0) & (nskip == 0)
                         & (jump == 0) & (sgap[0] < 0)))
            lit_mode = lit_ok.reshape(T, TUB).all(axis=1)
            # tile mode 2: mixed tiles whose paired-step bound is
            # meaningfully below the token bound run the pairing loop
            # (the speculative second decode costs ~15% per step, so it
            # must buy back at least that many steps)
            pair_mode = ~lit_mode & (pb * 8 <= kb * 7)
            mode = np.where(lit_mode, 1,
                            np.where(pair_mode, 2, 0)).astype(np.int32)
            kb = np.where(lit_mode, -(-kb // 2),
                          np.where(pair_mode, pb, kb)).astype(np.int32)
            prep["kbound"] = jnp.asarray(np.stack([kb, mode], axis=1))
            prep["stored_gap"] = (
                jnp.asarray(np.concatenate([sgap, sglen], axis=0))
                if has_stored else None)
        else:
            prep.update(spans=jnp.asarray(spans_w), sub0=jnp.asarray(sub0),
                        n_tokens=jnp.asarray(n_tokens),
                        skip=jnp.asarray(skip), lit=jnp.asarray(lit),
                        dist=jnp.asarray(dist),
                        k_max=self._pow2(int(n_tokens.max()) + 1, 64))
        return prep

    def run(self, bodies: list[bytes], indexes: list[CheckpointIndex],
            keep_on_device: bool = True, collapse: bool | None = None):
        from ..lz77.errors import DecompressionError

        B0 = len(bodies)
        out_size0 = int(indexes[0].out_size)
        ob0 = int(indexes[0].ob)
        Ui0 = (out_size0 + ob0 - 1) // ob0
        # the index knows the exact match-byte and match-segment
        # populations, so the expansion buffers are sized tightly; caps
        # round to 8K (not pow2 — every compacted op is cap-linear, and
        # the pow2 padding cost up to 2× on all of them)
        r8k = lambda n: max(1 << 10, -(-n // 8192) * 8192)
        match_total = sum(int(ix.match_bytes) for ix in indexes)
        if collapse is None:
            collapse = self.auto_collapse(
                match_total, B0, out_size0, Ui0, ob0)
        # match-rich batches: probe STREAMS' match structure BEFORE the
        # (expensive) device span staging and pick the tier up front;
        # near-uniform match distances route to the host tier outright
        # (see _probe_match_profile).  Probing is PER STREAM (a spread
        # sample first, every stream on disagreement), so a mixed batch
        # splits across tiers instead of riding one engine wholesale.
        force_sweeps = False
        if (collapse and (Ui0 * ob0) % 128 == 0
                and match_total * 2 > B0 * out_size0):
            from .inflate_seqcopy import RECORDS_SMEM_CAP
            from .. import native as _native

            def _decide(body):
                probe = _probe_match_profile(body)
                if probe is None:
                    return "device"
                cov48, runs, mb, ob_seen = probe
                est_runs = runs * out_size0 // max(ob_seen, 1)
                if est_runs * B0 > RECORDS_SMEM_CAP:
                    if cov48 < 0.5 and _native.available():
                        # zlib -9-class noisy content: ~uniform match
                        # distances (measured 18K+ distinct, top-48
                        # coverage ~4 %) defeat every dense device
                        # strategy on this chip; the multithreaded
                        # native tier wins outright
                        return "host"
                    return "sweeps"
                return "device"

            sample = sorted({0, B0 // 3, (2 * B0) // 3, B0 - 1})
            dec = {i: _decide(bodies[i]) for i in sample}
            if len(set(dec.values())) > 1:
                # sampled classes disagree: probe every stream
                for i in range(B0):
                    if i not in dec:
                        dec[i] = _decide(bodies[i])
            else:
                # homogeneous sample: the whole batch takes its class
                common = dec[sample[0]]
                dec = {i: common for i in range(B0)}
            hostset = [i for i in range(B0) if dec.get(i) == "host"]
            if 0 < len(hostset) < B0:
                # mixed batch: host tier serves its streams on native
                # threads OVERLAPPED with the device subset's pipeline
                from concurrent.futures import ThreadPoolExecutor

                devset = [i for i in range(B0) if i not in hostset]
                pool = ThreadPoolExecutor(max_workers=4)
                fut = pool.submit(_native.inflate_batch,
                                  [bodies[i] for i in hostset],
                                  out_size0, "ios")
                dout, dadler = self.run([bodies[i] for i in devset],
                                        [indexes[i] for i in devset],
                                        keep_on_device=False,
                                        collapse=collapse)
                houts = fut.result()
                hadler = list(pool.map(_native.adler32, houts))
                pool.shutdown()
                arr = np.empty((B0, out_size0), np.uint8)
                adler = np.empty(B0, np.uint32)
                for j, i in enumerate(devset):
                    arr[i] = dout[j]
                    adler[i] = dadler[j]
                for j, i in enumerate(hostset):
                    arr[i] = np.frombuffer(houts[j], np.uint8)
                    adler[i] = hadler[j]
                self.last_plan = dict(tier="mixed", hostset=hostset)
                if keep_on_device:
                    return jnp.asarray(arr), adler
                return arr, adler
            if hostset:
                # whole batch on the multithreaded native tier; the
                # checksums ride a thread pool too (ctypes releases
                # the GIL)
                from concurrent.futures import ThreadPoolExecutor

                assert all(int(ix.out_size) == out_size0
                           for ix in indexes)
                outs = _native.inflate_batch(bodies, out_size0, "ios")
                with ThreadPoolExecutor() as pool:
                    adler = np.asarray(
                        list(pool.map(_native.adler32, outs)), np.uint32)
                arr = np.stack([np.frombuffer(o, np.uint8)
                                for o in outs])
                self.last_plan = dict(tier="host")
                if keep_on_device:
                    return jnp.asarray(arr), adler
                return arr, adler
            if any(v == "sweeps" for v in dec.values()):
                force_sweeps = True

        prep = self.prepare(bodies, indexes)
        cap_max = prep["B"] * prep["Ui_pad"] * prep["ob"]
        expand_cap = min(r8k(match_total + 64), self._pow2(cap_max))
        if all(ix.match_segs >= 0 for ix in indexes):
            seg_total = sum(int(ix.match_segs) for ix in indexes)
            seg_cap = min(r8k(seg_total + 64), self._pow2(cap_max))
        else:
            seg_cap = None
        interpret = jax.default_backend() == "cpu"
        # match-dominated batches first try the sequential-copy records
        # kernel (inflate_seqcopy) — merged uniform-distance runs, so
        # the cap starts well below the match-byte count and grows
        # within the SMEM budget.  Content whose records overflow even
        # that (foreign-encoder streams: millions of SHORT matches)
        # switches to the dense distance sweeps, where expand_cap
        # becomes the RESIDUAL cap.
        records_cap = None
        sweep_k = None
        can_collapse_modes = (collapse
                              and (prep["Ui_pad"] * prep["ob"]) % 128 == 0)
        if can_collapse_modes:
            from .inflate_seqcopy import RECORDS_SMEM_CAP

            records_cap = min(RECORDS_SMEM_CAP,
                              r8k(max(4096, match_total // 16)))

        def to_sweeps():
            nonlocal records_cap, sweep_k, expand_cap, seg_cap
            records_cap = None
            sweep_k = 48
            expand_cap = min(r8k(max(match_total // 8, 1 << 14)),
                             self._pow2(cap_max))
            if seg_cap is not None:
                seg_cap = min(seg_cap, expand_cap)

        if force_sweeps and can_collapse_modes:
            to_sweeps()

        while True:
            if prep["use_pallas"]:
                out, flag, adler, ovf = inflate_indexed_pallas(
                    prep["kbound"], prep["spans3"], prep["meta"],
                    prep["tabs"], prep["symtab"], ob=prep["ob"],
                    n_streams=prep["B"], out_size=prep["out_size"],
                    expand_cap=expand_cap, S=prep["S"],
                    interpret=interpret, seg_cap=seg_cap,
                    multiblock=prep["multiblock"],
                    has_stored=prep["has_stored"],
                    stored_gap=prep["stored_gap"]
                    if prep["has_stored"] else None, collapse=collapse,
                    records_cap=records_cap, sweep_k=sweep_k)
            else:
                out, flag, adler, ovf = inflate_indexed(
                    prep["spans"], prep["sub0"], prep["n_tokens"],
                    prep["skip"], prep["lit"], prep["dist"], ob=prep["ob"],
                    n_streams=prep["B"], out_size=prep["out_size"],
                    expand_cap=expand_cap, k_max=prep["k_max"],
                    collapse=collapse, records_cap=records_cap,
                    interpret=interpret, sweep_k=sweep_k)
            if bool(ovf):
                if records_cap is not None and collapse and (
                        expand_cap >= (prep["B"] * prep["Ui_pad"]
                                       * prep["ob"]) >> 1):
                    # records-mode overflow: grow within SMEM, then
                    # switch to the dense distance sweeps
                    from .inflate_seqcopy import RECORDS_SMEM_CAP

                    if records_cap < RECORDS_SMEM_CAP:
                        records_cap = min(records_cap * 4,
                                          RECORDS_SMEM_CAP)
                    else:
                        to_sweeps()
                    continue
                if expand_cap >= cap_max:
                    raise DecompressionError.invalid_huffman_table()
                expand_cap = min(expand_cap * 4, self._pow2(cap_max))
                if seg_cap is not None:
                    seg_cap = min(seg_cap * 4, self._pow2(cap_max))
                continue
            break
        if int(np.asarray(flag).max()) != 0:
            raise DecompressionError.invalid_huffman_table()
        # the converged launch parameters (after any overflow retries) —
        # benchmarks re-dispatch the same compiled program with these
        self.last_plan = dict(tier="device", expand_cap=expand_cap,
                              seg_cap=seg_cap, collapse=collapse,
                              records_cap=records_cap, sweep_k=sweep_k)
        return (out, np.asarray(adler)) if keep_on_device else (
            np.asarray(out), np.asarray(adler))

    def inflate_zlib_batch(self, datas: list[bytes], out_size: int,
                           keep_on_device: bool = True):
        """Complete zlib streams (+host-built indexes) → (B, out_size)."""
        from ..lz77.errors import DecompressionError, StreamHeaderError
        from ..lz77.index import build_index

        bodies, indexes = [], []
        for d in datas:
            if len(d) < 6:
                raise DecompressionError.invalid_stream_checksum(0, 0)
            cmf, flg = d[0], d[1]
            if cmf & 0x0F != 0x08:
                raise StreamHeaderError.invalid_compression_method(
                    cmf & 0x0F)
            if (cmf * 256 + flg) % 31 != 0:
                raise StreamHeaderError.invalid_check_bits()
            body = d[2:-4]
            ix = build_index(body, out_size, self.ob)
            if ix is None:
                return None  # caller falls back to the general engine
            bodies.append(body)
            indexes.append(ix)
        out, adler = self.run(bodies, indexes, keep_on_device)
        for i, d in enumerate(datas):
            declared = int.from_bytes(d[-4:], "big")
            if int(adler[i]) != declared:
                raise DecompressionError.invalid_stream_checksum(
                    declared, int(adler[i]))
        return out
