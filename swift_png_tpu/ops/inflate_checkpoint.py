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
                                             "expand_cap", "k_max"))
def inflate_indexed(spans, sub0, n_tokens, skip, lit_lengths, dist_lengths,
                    *, ob: int, n_streams: int, out_size: int,
                    expand_cap: int, k_max: int):
    """Full indexed inflate for ``n_streams`` same-size streams.

    Returns ``(out (B, out_size) uint8, flags (U,) int32, adler (B,)
    uint32, expand_overflow)``.  ``lit_lengths``/``dist_lengths`` are
    ``(B, 288)`` / ``(B, 32)`` per-stream code lengths (one dynamic block
    per stream).
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
    return _finish(ptr, litv, flag, B, Opad, out_size, expand_cap)


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
    d = out.astype(jnp.int32)
    i = jnp.arange(Opad, dtype=jnp.int32)[None, :]
    live = i < out_size
    w = _mod65521(jnp.where(live, out_size - i, 0))
    p = jnp.where(live, w * d, 0)          # < 65521·255 < 2^24
    pc = p.reshape(B, -1, 64).sum(axis=2)  # < 2^30
    pc = _mod65521(pc)
    s2 = out_size % 65521
    while pc.shape[1] > 1:
        n = pc.shape[1]
        if n > 8192:
            pc = _mod65521(pc.reshape(B, -1, 64).sum(axis=2))
        else:
            pc = _mod65521(pc.sum(axis=1, keepdims=True))
    s2 = _mod65521(pc[:, 0] + s2)
    dc = jnp.where(live, d, 0).reshape(B, -1, 64).sum(axis=2)
    while dc.shape[1] > 1:
        n = dc.shape[1]
        if n > 8192:
            dc = _mod65521(dc.reshape(B, -1, 64).sum(axis=2))
        else:
            dc = _mod65521(dc.sum(axis=1, keepdims=True))
    s1 = _mod65521(dc[:, 0] + 1)
    return (s2.astype(jnp.uint32) << 16) | s1.astype(jnp.uint32)


def _finish(ptr, litv, flag, B, Opad, out_size, expand_cap):
    """Shared tail: compacted pointer-doubling expansion + Adler-32."""
    N = ptr.shape[0]
    # ---- expansion: compacted pointer doubling ------------------------
    is_m = (ptr != jnp.arange(N, dtype=jnp.int32))
    cs = _cumsum_mxu(is_m.astype(jnp.int32))
    pos = cs - 1
    keep = is_m & (pos < expand_cap)
    cidx = jnp.full(expand_cap, N, jnp.int32).at[
        jnp.where(keep, pos, expand_cap)  # out-of-bounds ⇒ dropped
    ].set(jnp.where(keep, jnp.arange(N, dtype=jnp.int32), N),
          mode="drop")
    ptr_pad = jnp.concatenate([ptr, jnp.arange(N, N + 1, dtype=jnp.int32)])
    p = ptr_pad[jnp.clip(cidx, 0, N)]

    def e_cond(st):
        _, changed = st
        return changed

    def e_body(st):
        p, _ = st
        nxt = ptr_pad[jnp.clip(p, 0, N)]
        return nxt, jnp.any(nxt != p)

    p, _ = jax.lax.while_loop(e_cond, e_body, (p, jnp.bool_(True)))
    out = litv
    src = out[jnp.clip(p, 0, N - 1)]
    out = out.at[jnp.clip(cidx, 0, N - 1)].set(
        jnp.where(cidx < N, src, out[jnp.clip(cidx, 0, N - 1)]))
    ovf = jnp.sum(is_m) > expand_cap

    out2 = out.reshape(B, Opad)
    adler = _adler_batch(out2, out_size)
    return out2[:, :out_size], flag, adler, ovf


@functools.partial(jax.jit, static_argnames=("ob", "n_streams", "out_size",
                                             "expand_cap", "k_max", "S",
                                             "tiles_per_stream",
                                             "interpret"))
def inflate_indexed_pallas(spans3, meta, params, lit_attr, dist_attr, *,
                           ob: int, n_streams: int, out_size: int,
                           expand_cap: int, k_max: int, S: int,
                           tiles_per_stream: int, interpret: bool = False):
    """Indexed inflate with the Pallas decode+stamp kernel.

    Same contract as :func:`inflate_indexed`; the token decode and
    token→byte attribution run in one VMEM kernel
    (``inflate_pallas.decode_stamp_pallas``), leaving only the
    back-reference expansion and checksum to XLA.
    """
    from .inflate_pallas import decode_stamp_pallas

    B = n_streams
    attr4, kflag = decode_stamp_pallas(
        spans3, meta, params, lit_attr, dist_attr, S=S, ob=ob,
        k_max=k_max, tiles_per_stream=tiles_per_stream,
        interpret=interpret)
    U = attr4.shape[0] * attr4.shape[1] * 128
    Ui = U // B
    Opad = Ui * ob
    # (T, TUR, ob, 128) → unit-major (U, ob)
    attr = jnp.transpose(attr4, (0, 1, 3, 2)).reshape(U, ob)
    flag = kflag.reshape(U)

    b = jnp.arange(ob, dtype=jnp.int32)[None, :]
    ustart = jnp.arange(U, dtype=jnp.int32)[:, None] * ob
    j = ustart + b
    live = (j % Opad) < out_size
    ism_b = attr > 0
    covered = attr != 0
    litv = jnp.where(live & (attr < 0), -attr - 1, 0
                     ).reshape(-1).astype(jnp.uint8)
    ptr = jnp.where(live & ism_b, j - attr, j).reshape(-1)
    flag = flag | jnp.where(
        jnp.any((ptr.reshape(U, ob) < (j - j % Opad)) & live & ism_b,
                axis=1), F_BAD, 0)
    flag = flag | jnp.where(jnp.any(live & ~covered, axis=1), F_BAD, 0)
    # inactive padding units report coverage flags only for live bytes —
    # mask their kernel coverage flag when they own no live bytes
    n_live = jnp.sum(live.astype(jnp.int32), axis=1)
    flag = jnp.where(n_live == 0, 0, flag)
    return _finish(ptr, litv, flag, B, Opad, out_size, expand_cap)


class CheckpointInflator:
    """Host wrapper: span slicing, bucketing, verification.

    One compiled program per (units, span, k_max, out_size) bucket.  The
    fast path serves single-dynamic-block streams with a
    :class:`CheckpointIndex`; anything else belongs to the general
    engines (``InflateFused`` / host / native tiers).
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

    def prepare(self, bodies: list[bytes], indexes: list[CheckpointIndex]):
        """Slice per-unit spans to a dense device layout (host memcpy)."""
        from .inflate_pallas import TUB, prepare_tables

        pallas = self.backend == "pallas"
        out_size = indexes[0].out_size
        ob = indexes[0].ob
        Ui = (out_size + ob - 1) // ob
        if pallas:
            Ui_pad = -(-Ui // TUB) * TUB  # stream tiles never split
        else:
            Ui_pad = Ui
        B = len(bodies)
        span_bytes = max(ix.max_span_bytes() for ix in indexes)
        if pallas:
            S = -(-((span_bytes + 3) // 4) // 32) * 32  # exact-ish width
        else:
            S = self._pow2((span_bytes + 3) // 4, 16)
        U = B * Ui_pad
        spans = np.zeros((U, S * 4), np.uint8)
        sub0 = np.zeros(U, np.int32)
        n_tokens = np.zeros(U, np.int32)
        skip = np.zeros(U, np.int32)
        owned = np.zeros(U, np.int32)
        lit = np.zeros((B, 288), np.int32)
        dist = np.zeros((B, 32), np.int32)
        for i, (body, ix) in enumerate(zip(bodies, indexes)):
            assert ix.out_size == out_size and ix.ob == ob
            sb = (ix.bit_pos >> 3).astype(np.int64)
            buf = np.frombuffer(body, np.uint8)
            base = i * Ui_pad
            for u in range(Ui):
                s = int(sb[u])
                e = min(len(buf), s + S * 4)
                spans[base + u, : e - s] = buf[s:e]
            sub0[base: base + Ui] = (
                ix.bit_pos - (sb << 3).astype(np.uint64)).astype(np.int32)
            n_tokens[base: base + Ui] = ix.n_tokens
            skip[base: base + Ui] = ix.skip
            owned[base: base + Ui] = np.minimum(
                ob, out_size - np.arange(Ui) * ob)
            lit[i] = ix.lit_lengths
            dist[i] = ix.dist_lengths
        spans32 = spans.reshape(U, S, 4).astype(np.uint32)
        spans_w = (spans32[:, :, 0] | spans32[:, :, 1] << 8
                   | spans32[:, :, 2] << 16 | spans32[:, :, 3] << 24)
        prep = dict(out_size=out_size, ob=ob, B=B, Ui_pad=Ui_pad, S=S)
        if pallas:
            Ur = U // 128
            T = U // TUB
            # transposed span layout: units on lanes, words on sublanes
            prep["spans3"] = jnp.asarray(np.ascontiguousarray(
                spans_w.reshape(T, TUB // 128, 128, S).transpose(0, 1, 3, 2)))
            prep["meta"] = jnp.asarray(
                np.stack([sub0, skip, owned]).reshape(3, Ur, 128))
            tabs = [prepare_tables(lit[i], dist[i]) for i in range(B)]

            def pad8(rows):
                a = np.stack(rows)  # (B, W)
                out = np.zeros((B, 8, a.shape[1]), np.int32)
                out[:, 0, :] = a
                return jnp.asarray(out)

            def lanes(rows, n):
                a = np.stack(rows)[:, :n]  # (B, n)
                return jnp.asarray(np.repeat(a[:, :, None], 128, axis=2))

            prep["params"] = pad8([t[0] for t in tabs])
            prep["lit_attr"] = lanes([t[1] for t in tabs], 384)
            prep["dist_attr"] = lanes([t[2] for t in tabs], 32)
            prep["tiles_per_stream"] = Ui_pad // TUB
            prep["k_max"] = -(-(int(n_tokens.max()) + 1) // 16) * 16
        else:
            prep.update(spans=jnp.asarray(spans_w), sub0=jnp.asarray(sub0),
                        n_tokens=jnp.asarray(n_tokens),
                        skip=jnp.asarray(skip), lit=jnp.asarray(lit),
                        dist=jnp.asarray(dist),
                        k_max=self._pow2(int(n_tokens.max()) + 1, 64))
        return prep

    def run(self, bodies: list[bytes], indexes: list[CheckpointIndex],
            keep_on_device: bool = True):
        from ..lz77.errors import DecompressionError

        prep = self.prepare(bodies, indexes)
        cap_max = prep["B"] * prep["Ui_pad"] * prep["ob"]
        # the index knows the exact match-byte population (= the compacted
        # expansion set), so the expansion buffers are sized tightly
        match_total = sum(int(ix.match_bytes) for ix in indexes)
        expand_cap = min(self._pow2(match_total + 64, 1 << 10),
                         self._pow2(cap_max))
        interpret = jax.default_backend() == "cpu"
        while True:
            if self.backend == "pallas":
                out, flag, adler, ovf = inflate_indexed_pallas(
                    prep["spans3"], prep["meta"], prep["params"],
                    prep["lit_attr"], prep["dist_attr"], ob=prep["ob"],
                    n_streams=prep["B"], out_size=prep["out_size"],
                    expand_cap=expand_cap, k_max=prep["k_max"],
                    S=prep["S"],
                    tiles_per_stream=prep["tiles_per_stream"],
                    interpret=interpret)
            else:
                out, flag, adler, ovf = inflate_indexed(
                    prep["spans"], prep["sub0"], prep["n_tokens"],
                    prep["skip"], prep["lit"], prep["dist"], ob=prep["ob"],
                    n_streams=prep["B"], out_size=prep["out_size"],
                    expand_cap=expand_cap, k_max=prep["k_max"])
            if bool(ovf):
                if expand_cap >= cap_max:
                    raise DecompressionError.invalid_huffman_table()
                expand_cap = min(expand_cap * 4, self._pow2(cap_max))
                continue
            break
        if int(np.asarray(flag).max()) != 0:
            raise DecompressionError.invalid_huffman_table()
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
