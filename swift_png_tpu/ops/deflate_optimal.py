"""Device optimal parse (levels 8–13): distance-menu DP in a Pallas kernel.

The reference's levels 8–13 build a match DAG per block and run an
adaptive-cost shortest path over it
(``Sources/LZ77/Deflator/LZ77.DeflatorMatches.swift:265-379`` +
``…Depths.swift:4-112``).  On this TPU every random access costs ~13 ns,
so the hash-chain + LCP-probe search that feeds the DAG would be
gather-bound.  The TPU-native redesign replaces it end to end with dense
and VMEM-resident compute:

* **candidate generation** — a *distance menu*: ~two dozen distances
  (small constants, pixel/row strides, plus data-driven picks sampled by
  the native tier) are scanned densely: ``eq_d[i] = data[i] == data[i-d]``
  is a shift-compare, and the exact match run at every position is the
  suffix run-length of ``eq_d`` — one associative scan per menu entry, no
  gathers, exact matches only;
* **top-K selection** — per position the K best menu hits by
  (run, cheap-decade) score, dense;
* **minimum-cost path** — a Pallas kernel runs the forward DP in VMEM:
  chunks of ``NB`` bytes ride the lane dimension (128 independent DPs per
  tile), positions advance sequentially, and each step relaxes the
  literal edge plus K match edges over all lengths 3…run with a masked
  range-min on the sublane dimension; provenance arrays then drive an
  in-kernel backtrack that emits packed ``DeflatorTerm`` tokens in
  position order;
* **cost refinement** — the reference's ``Depths`` iteration: term
  frequencies → host tree build → new cost tables → re-run the kernel
  (device↔host traffic per iteration is ~1 KB of tables).

Chunk boundaries (``NB`` bytes) play the role of the reference's
``GRAPH_NODES`` graph windows (``lz77/deflate.py:346``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..lz77 import constants as C
from ..lz77.deflate import Depths, search_parameters
from ..lz77.huffman import lengths_from_frequencies

__all__ = ["menu_candidates", "menu_candidates_pallas",
           "optimal_parse_device", "deflate_device_optimal",
           "optimal_pipeline_batch", "deflate_device_optimal_batch"]

NB = 1024   # DP chunk length (bytes per lane)
KCAND = 2   # match edges per position fed to the DP (k=4 measured +0.008% size)


# ---------------------------------------------------------------------------
# candidate generation: distance menu + dense run scans
# ---------------------------------------------------------------------------

def default_menu(n: int, bpp: int = 4, pitch: int = 0) -> list[int]:
    """Structural distance menu for filtered image data."""
    menu = [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 64]
    if bpp > 1:
        menu += [bpp, 2 * bpp, 3 * bpp]
    if pitch:
        menu += [pitch - bpp, pitch, pitch + bpp, 2 * pitch]
    out = []
    for d in menu:
        if 1 <= d <= min(32768, n - 1) and d not in out:
            out.append(d)
    return out


def _walk_stats(body: bytes, top: int):
    """Token walk of a sampled stream: (top distances, lit/dist freqs).

    The frequencies warm-start the ``Depths`` cost model (the reference
    seeds it with generic costs and doubles the refinement iterations to
    compensate, ``…Matches.Depths.swift:28-45``; a sampled seed reaches
    the same costs with the level's plain iteration count).
    """
    from ..lz77.index import _BitWalker, _flat_lut
    from ..lz77 import constants as CC

    w = _BitWalker(body)
    final = w.read(1)
    btype = w.read(2)
    if btype != 2:
        return [], None, None
    hlit = w.read(5) + 257
    hdist = w.read(5) + 1
    hclen = w.read(4) + 4
    ml = np.zeros(19, np.int64)
    for i in range(hclen):
        ml[CC.CODELENGTH_ORDER[i]] = w.read(3)
    try:
        mlut = _flat_lut(ml, 7)
    except Exception:
        return [], None, None
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        e = int(mlut[w.peek(7)])
        ln, sym = e >> 16, e & 0xFFFF
        if ln == 0:
            return [], None, None
        w.pos += ln
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            lengths += [lengths[-1]] * (3 + w.read(2))
        elif sym == 17:
            lengths += [0] * (3 + w.read(3))
        else:
            lengths += [0] * (11 + w.read(7))
    la = np.array(lengths, np.int64)
    lit = np.zeros(288, np.int64)
    lit[:hlit] = la[:hlit]
    dl = np.zeros(32, np.int64)
    dl[:hdist] = la[hlit:]
    try:
        litlut = _flat_lut(lit, 15)
        distlut = (_flat_lut(dl, 15) if np.count_nonzero(dl)
                   else np.zeros(2, np.int64))
    except Exception:
        return [], None, None
    hist: dict[int, int] = {}
    lit_freq = np.zeros(286, np.int64)
    dist_freq = np.zeros(30, np.int64)
    nbits = len(body) * 8
    while w.pos + 15 < nbits:
        e = int(litlut[w.peek(15)])
        ln, sym = e >> 16, e & 0xFFFF
        if ln == 0:
            break
        w.pos += ln
        if sym < 286:
            lit_freq[sym] += 1
        if sym < 256:
            continue
        if sym == 256:
            break
        dec = sym - 257
        if dec > 28:
            break
        run_eb = int(CC.RUN_EXTRA[dec])
        w.read(run_eb)
        e2 = int(distlut[w.peek(15)])
        dln, dsym = e2 >> 16, e2 & 0xFFFF
        if dln == 0 or dsym > 29:
            break
        w.pos += dln
        dist = int(CC.DISTANCE_BASE[dsym]) + w.read(
            int(CC.DISTANCE_EXTRA[dsym]))
        dist_freq[dsym] += 1
        hist[dist] = hist.get(dist, 0) + 1
    tops = [d for d, _ in sorted(hist.items(), key=lambda kv: -kv[1])[:top]]
    return tops, lit_freq, dist_freq


@functools.partial(jax.jit, static_argnames=("menu", "k"))
def menu_candidates(data: jnp.ndarray, n: jnp.ndarray, *, menu: tuple,
                    k: int = KCAND):
    """Exact match runs at every position for each menu distance; top-k.

    Args:
      data: ``(N,)`` uint8 (padded).
      n: live byte count.
      menu: static tuple of candidate distances.
      k: matches kept per position.

    Returns ``(runs (k, N) int32, dists (k, N) int32)`` — runs clipped to
    258 and to the live range; run < 3 means no edge.
    """
    N = data.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    d32 = data.astype(jnp.int32)

    # shifted-equality masks for every menu distance at once
    eqs = []
    for d in menu:
        d = int(d)
        eqs.append(jnp.concatenate(
            [jnp.zeros(d, bool), d32[d:] == d32[:-d]]) & (pos < n))
    eq = jnp.stack(eqs)                      # (D, N)

    # suffix run length by log-doubling: r_k = min(true_run, 2^k);
    # r_{k+1}[i] = r_k[i] + (r_k[i] == 2^k) · r_k[i + 2^k].  The first
    # seven steps stay in uint8 (values ≤ 128) — ¼ the memory traffic of
    # an int32 associative scan per distance.
    r8 = eq.astype(jnp.uint8)
    for lv in range(7):
        step = 1 << lv
        nxt = jnp.concatenate(
            [r8[:, step:], jnp.zeros((r8.shape[0], step), jnp.uint8)],
            axis=1)
        r8 = r8 + jnp.where(r8 == step, nxt, 0)
    r = r8.astype(jnp.int32)
    for lv in (7, 8):
        step = 1 << lv
        nxt = jnp.concatenate(
            [r[:, step:], jnp.zeros((r.shape[0], step), jnp.int32)],
            axis=1)
        r = r + jnp.where(r == step, nxt, 0)
    r = jnp.minimum(r, 258)

    dvec = jnp.array([int(d) for d in menu], jnp.int32)[:, None]
    R = jnp.where(pos[None, :] >= dvec,
                  jnp.minimum(r, jnp.maximum(n - pos, 0)[None, :]), 0)
    DD = jnp.stack([jnp.full(N, int(C.DISTANCE_DECADE[d]), jnp.int32)
                    for d in menu])
    # score: prefer long runs, then cheap (near) distances
    score = R * 64 - DD
    score = jnp.where(R >= 3, score, -1)
    out_runs, out_dists = [], []
    dist_arr = jnp.array([int(d) for d in menu], jnp.int32)
    iota_d = jnp.arange(len(menu), dtype=jnp.int32)[:, None]
    for _ in range(k):
        best = jnp.argmax(score, axis=0)     # (N,)
        bruns = jnp.take_along_axis(R, best[None], axis=0)[0]
        bscore = jnp.take_along_axis(score, best[None], axis=0)[0]
        bdist = dist_arr[best]
        ok = bscore >= 0
        out_runs.append(jnp.where(ok, bruns, 0))
        out_dists.append(jnp.where(ok, bdist, 1))
        score = jnp.where(iota_d == best[None, :], -1, score)  # dense mask
    return jnp.stack(out_runs), jnp.stack(out_dists)


# ---------------------------------------------------------------------------
# candidate generation, Pallas production path
# ---------------------------------------------------------------------------

CR2 = 1024         # positions per lane chunk — EQUAL to the DP kernel's
                   # NB, so the candidate kernel's output tiles ARE the
                   # DP's (Tc, K, NB, 128) input blocks (round 5: the
                   # (2, Ntot) flatten + re-tile cost two relayouts)
CW = CR2 + 504     # eq rows per lane incl. forward halo — the doubling
                   # cone from the last core row reaches exactly 504
                   # positions (Σ 2^3…2^8), and CR2=1024 sits 4 KB from
                   # the 16 MB scoped-VMEM limit, so the halo is exact
DMAX_STEP = 8      # menu slots are padded to a multiple of this


def _make_cand_kernel(dmax: int, per_image: bool = False):
    """Candidate kernel: log-doubling suffix runs + running top-2, VMEM.

    The XLA formulation (:func:`menu_candidates`) pays ~20 barrier-
    separated HBM passes over the ``(D, N)`` grid (measured 266–412
    ms/MB); a first Pallas port with flat row-major layout spent all its
    time in ``pltpu.roll`` (measured ~1.4 ns/element — cross-lane
    shuffles are ~100× a vector op).  This version uses a
    **chunk-per-lane** layout: lane ``l`` of a tile holds positions
    ``[l·CR2, (l+1)·CR2)`` consecutively along sublanes plus a 512-row
    halo duplicating the next chunk's head, so every shift in the
    doubling recurrence is a static row slice — zero rolls, zero
    gathers.  The inputs are built on the XLA side (dense shifts are
    what XLA is good at) with **dynamic** distances, so one compiled
    kernel serves every menu; XLA also runs the first three doubling
    levels (``r₃ = min(run, 8)``, uint8) because their row shifts of
    1/2/4 are sublane-MISALIGNED in this layout — Mosaic lowers those
    to cross-sublane moves at roll-like cost, while every remaining
    step (8…256) is a multiple of the sublane count and stays a cheap
    aligned slice.
    """
    import jax.experimental.pallas as pl  # noqa: F401

    def kernel(dmeta_ref, eq_ref, out_ref):
        z = jnp.zeros((256, 128), jnp.int32)
        s1 = jnp.full((CR2, 128), -1, jnp.int32)
        rd1 = jnp.zeros((CR2, 128), jnp.int32)
        dd1 = jnp.ones((CR2, 128), jnp.int32)
        s2 = jnp.full((CR2, 128), -1, jnp.int32)
        rd2 = jnp.zeros((CR2, 128), jnp.int32)
        dd2 = jnp.ones((CR2, 128), jnp.int32)
        for j in range(dmax):
            if per_image:
                # dmeta block (1, dmax, 2) selected by the tile's image
                dist = dmeta_ref[0, j, 0]
                dcost = dmeta_ref[0, j, 1]
            else:
                dist = dmeta_ref[j, 0]
                dcost = dmeta_ref[j, 1]
            e = eq_ref[0, j].astype(jnp.int32)  # (CW, 128) r3=min(run,8)
            rr = jnp.concatenate([e, z], axis=0)
            # suffix run by log-doubling (int32 — Mosaic rejects i16
            # compares on this target) starting from the XLA-computed
            # r3: every step is a multiple-of-8 (sublane-aligned) row
            # slice, and the 256 zero slack rows absorb the
            # out-of-range reads (the core rows' 504-position
            # dependency cone stays inside CW)
            for lv in range(3, 9):
                step = 1 << lv
                core = rr[:CW] + jnp.where(rr[:CW] == step,
                                           rr[step:step + CW], 0)
                rr = jnp.concatenate([core, z], axis=0)
            rd = jnp.minimum(rr[:CR2], 258)
            score = jnp.where((rd >= 3) & (dist > 0), rd * 64 - dcost, -1)
            b1 = score > s1
            b2 = ~b1 & (score > s2)
            s2 = jnp.where(b1, s1, jnp.where(b2, score, s2))
            rd2 = jnp.where(b1, rd1, jnp.where(b2, rd, rd2))
            dd2 = jnp.where(b1, dd1, jnp.where(b2, dist, dd2))
            s1 = jnp.where(b1, score, s1)
            rd1 = jnp.where(b1, rd, rd1)
            dd1 = jnp.where(b1, dist, dd1)
        out_ref[0, 0] = jnp.where(s1 >= 0, (dd1 << 9) | rd1, 1 << 9)
        out_ref[0, 1] = jnp.where(s2 >= 0, (dd2 << 9) | rd2, 1 << 9)

    return kernel


@functools.partial(jax.jit, static_argnames=("dmax", "interpret"))
def menu_candidates_pallas(dists, decades, data, n, *, dmax: int,
                           interpret: bool = False):
    """Pallas candidate search: packed ``dist<<9 | run`` per position.

    Args:
      dists/decades: ``(dmax,)`` int32 — menu distances (0 = unused
        slot) and their decade costs; **dynamic**, so the kernel is
        compiled once per (dmax, length-bucket), never per menu.
      data: ``(Ntot,)`` uint8, ``Ntot`` a multiple of ``CR2·128``.
      n: scalar int32 — live byte count.

    Returns ``(T, 2, CR2, 128)`` int32 top-2 candidates in the DP
    kernel's chunk-per-lane tile layout (``CR2 == NB``, so tiles line
    up 1:1 — no relayout anywhere between the two kernels).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Ntot = data.shape[0]
    T = Ntot // (CR2 * 128)
    pos = jnp.arange(Ntot, dtype=jnp.int32)
    live = pos < n
    padded = jnp.concatenate([jnp.zeros(1 << 15, jnp.uint8), data])
    eqs = []
    for j in range(dmax):
        d = dists[j]
        sh = jax.lax.dynamic_slice(padded, ((1 << 15) - d,), (Ntot,))
        eqs.append(((data == sh) & live & (pos >= d)).astype(jnp.int8))
    eq = jnp.stack(eqs)                                # (dmax, Ntot)
    # first three doubling levels here (dense uint8 shifts, ~71 GB/s):
    # their 1/2/4-row slices would be sublane-misaligned in the kernel's
    # chunk-per-lane layout, which Mosaic lowers at roll-like cost
    for lv in range(3):
        step = 1 << lv
        nxt = jnp.concatenate(
            [eq[:, step:], jnp.zeros((dmax, step), jnp.int8)], axis=1)
        eq = eq + jnp.where(eq == step, nxt, 0)        # r3 = min(run, 8)
    # raw bytes ride as an extra row — see menu_candidates_pallas_batch
    eq = jnp.concatenate(
        [eq, jax.lax.bitcast_convert_type(data, jnp.int8)[None]], axis=0)
    base = eq.reshape(dmax + 1, T, 128, CR2)
    halo = jnp.concatenate(
        [eq[:, CR2:], jnp.zeros((dmax + 1, CR2), jnp.int8)],
        axis=1).reshape(dmax + 1, T, 128, CR2)[..., :CW - CR2]
    blk = jnp.transpose(jnp.concatenate([base, halo], axis=3),
                        (1, 0, 3, 2))              # (T, dmax+1, CW, 128)
    dmeta = jnp.stack([dists, decades], axis=1)        # (dmax, 2)
    out = pl.pallas_call(
        _make_cand_kernel(dmax),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dmax, CW, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, CR2, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2, CR2, 128), jnp.int32),
        interpret=interpret,
    )(dmeta, blk)
    return out, blk


@functools.partial(jax.jit, static_argnames=("dmax", "stride", "interpret"))
def menu_candidates_pallas_batch(dists2, decades2, data, nvec, *,
                                 dmax: int, stride: int,
                                 interpret: bool = False):
    """Batched candidate search with PER-IMAGE distance menus.

    ``data`` holds ``B`` independent streams, stream ``i`` at
    ``[i·stride, i·stride + nvec[i])``; ``dists2``/``decades2`` are
    ``(B, dmax)``.  Matches must not reference across stream
    boundaries, so each stream's shifted-equality masks use its own
    within-stream offsets; the kernel reads each tile's owning image's
    menu via a blocked SMEM spec (``stride`` must be a multiple of the
    ``CR2·128`` tile span — the batch pipeline pads images to tile
    multiples).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Ntot = data.shape[0]
    B = Ntot // stride
    T = Ntot // (CR2 * 128)
    TPC = stride // (CR2 * 128)
    off2 = jax.lax.broadcasted_iota(jnp.int32, (B, stride), 1)
    live2 = off2 < nvec[:, None]
    data2d = data.reshape(B, stride)
    padded2 = jnp.concatenate(
        [jnp.zeros((B, 1 << 15), jnp.uint8), data2d], axis=1)
    eqs = []
    for j in range(dmax):
        d = dists2[:, j]                               # (B,)
        # B static dynamic_slices, NOT a vmap: vmapping dynamic_slice
        # over per-image starts lowers to a GATHER of the whole window
        sh = jnp.stack([
            jax.lax.dynamic_slice(padded2[i], ((1 << 15) - d[i],),
                                  (stride,)) for i in range(B)])
        eqs.append(((data2d == sh) & live2
                    & (off2 >= d[:, None])).astype(jnp.int8).reshape(-1))
    eq = jnp.stack(eqs)                                # (dmax, Ntot)
    for lv in range(3):
        step = 1 << lv
        nxt = jnp.concatenate(
            [eq[:, step:], jnp.zeros((dmax, step), jnp.int8)], axis=1)
        eq = eq + jnp.where(eq == step, nxt, 0)        # r3 = min(run, 8)
    # the raw bytes ride along as one extra row: the SAME (128, CW) →
    # (CW, 128) relayout that tiles the eq masks also delivers the DP
    # kernel's chunk-per-lane byte layout — a separate u8 retile of the
    # data measured 35 ms/batch
    eq = jnp.concatenate(
        [eq, jax.lax.bitcast_convert_type(data, jnp.int8)[None]], axis=0)
    base = eq.reshape(dmax + 1, T, 128, CR2)
    halo = jnp.concatenate(
        [eq[:, CR2:], jnp.zeros((dmax + 1, CR2), jnp.int8)],
        axis=1).reshape(dmax + 1, T, 128, CR2)[..., :CW - CR2]
    blk = jnp.transpose(jnp.concatenate([base, halo], axis=3),
                        (1, 0, 3, 2))              # (T, dmax+1, CW, 128)
    dmeta = jnp.stack([dists2, decades2], axis=2)      # (B, dmax, 2)
    out = pl.pallas_call(
        _make_cand_kernel(dmax, per_image=True),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, dmax, 2), lambda t: (t // TPC, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dmax, CW, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, CR2, 128), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2, CR2, 128), jnp.int32),
        interpret=interpret,
    )(dmeta, blk)
    return out, blk


def stage_buf(data: bytes, Tc: int) -> jnp.ndarray:
    """One host→device staging of the input, sized for both the
    candidate kernel (``CR2·128`` granules) and the DP relayout
    (``NB·128`` granules)."""
    n = len(data)
    Npad = Tc * 128 * NB
    Ntot = -(-Npad // (CR2 * 128)) * (CR2 * 128)
    buf = np.zeros(Ntot, np.uint8)
    buf[:n] = np.frombuffer(data, np.uint8)
    return jnp.asarray(buf)


def candidates_device(data: bytes, menu: tuple, Tc: int,
                      interpret: bool,
                      dbuf: jnp.ndarray | None = None) -> jnp.ndarray:
    """Top-2 candidates AND the input bytes in the DP kernel's tile
    layout: ``(cand (Tc, 2, NB, 128) int32, data (Tc, NB, 128) int8)``
    — the candidate kernel emits both natively (``CR2 == NB``, the data
    rides its blk input), so nothing is relaid out between the kernels.

    Uses the Pallas kernel on TPU and the XLA formulation elsewhere
    (``interpret`` mirrors :func:`deflate_device_optimal`'s backend
    selection; the two paths are differentially tested).  Pass ``dbuf``
    (:func:`stage_buf`) to reuse an already-staged device input.
    """
    n = len(data)
    Npad = Tc * 128 * NB
    if dbuf is None:
        dbuf = stage_buf(data, Tc)
    if interpret:
        runs, dists = menu_candidates(dbuf[:Npad], jnp.int32(n),
                                      menu=menu, k=KCAND)
        cand = (dists << 9) | runs
        cand_t = jnp.transpose(cand.reshape(KCAND, Tc, 128, NB),
                               (1, 0, 3, 2))
        data_t = jnp.transpose(
            jax.lax.bitcast_convert_type(dbuf[:Npad], jnp.int8)
            .reshape(Tc, 128, NB), (0, 2, 1))
        return cand_t, data_t
    dmax = -(-max(len(menu), 1) // DMAX_STEP) * DMAX_STEP
    dv = np.zeros(dmax, np.int32)
    cv = np.zeros(dmax, np.int32)
    dv[:len(menu)] = list(menu)
    cv[:len(menu)] = [int(C.DISTANCE_DECADE[d]) for d in menu]
    cand, blk = menu_candidates_pallas(
        jnp.asarray(dv), jnp.asarray(cv), dbuf, jnp.int32(n), dmax=dmax)
    return cand, blk[:, dmax, :NB]


# ---------------------------------------------------------------------------
# cost tables (host, per Depths iteration)
# ---------------------------------------------------------------------------

def _tables_from_depths(depths: Depths):
    s = depths.storage.astype(np.int32)
    dep_lit = s[:256]
    runcost = s[256:512]                      # index L-3
    ddep = np.zeros(32, np.int32)
    ddep[:30] = s[512:542]
    rdinfo = np.zeros(256, np.int32)
    for L in range(3, 259):
        rd = int(C.RUN_DECADE[L])
        rdinfo[L - 3] = rd | int(C.RUN_BASE[rd]) << 5
    dbase = np.zeros(32, np.int32)
    dbase[:30] = C.DISTANCE_BASE[:30]
    return dep_lit, runcost, ddep, rdinfo, dbase


def _rep128(v: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.repeat(v[:, None], 128, axis=1).astype(np.int32))


_RD_OF_L = np.array([int(C.RUN_DECADE[L]) for L in range(3, 259)], np.int32)
_REX_OF_L = np.array([int(C.RUN_EXTRA[_RD_OF_L[i]])
                      for i in range(256)], np.int32)
_DEX = np.zeros(32, np.int32)
_DEX[:30] = C.DISTANCE_EXTRA[:30]


@jax.jit
def _device_depths_update(hist, dep_lit, runcost, ddep):
    """On-device ``Depths.update`` for the INTERMEDIATE DP iterations.

    The host path fetches the histogram (~30 ms tunnel round trip),
    package-merges a tree, and re-uploads quarter-bit cost tables per
    iteration.  Between iterations the DP only needs *costs*, not a
    valid emittable code, so fractional entropy costs
    ``-4·log2(freq/total)`` (clipped to the same [4, 60] quarter-bit
    range, zero-frequency symbols keeping their previous cost — the
    reference's update semantics, ``…Matches.Depths.swift:53-97``)
    stand in for tree lengths with no host round trip.  The FINAL
    iteration still fetches the histogram once and builds the real
    canonical trees on host.
    """
    litf = hist[:286].astype(jnp.float32)
    total = jnp.maximum(jnp.sum(litf), 1.0)
    q = jnp.clip(jnp.round(
        -4.0 * jnp.log2(jnp.maximum(litf, 0.5) / total)), 4, 60
    ).astype(jnp.int32)
    dep_lit2 = jnp.where(hist[:256] > 0, q[:256], dep_lit)
    rd = jnp.asarray(_RD_OF_L)
    qrun = q[257:286][rd] + 4 * jnp.asarray(_REX_OF_L)
    runcost2 = jnp.where(hist[257 + rd] > 0, qrun, runcost)
    distf = jnp.concatenate(
        [hist[288:318], jnp.zeros(2, hist.dtype)]).astype(jnp.float32)
    dtotal = jnp.maximum(jnp.sum(distf), 1.0)
    dq = jnp.clip(jnp.round(
        -4.0 * jnp.log2(jnp.maximum(distf, 0.5) / dtotal)), 4, 60
    ).astype(jnp.int32) + 4 * jnp.asarray(_DEX)
    ddep2 = jnp.where(distf > 0, dq, ddep)
    return dep_lit2, runcost2, ddep2


@jax.jit
def _rep128_dev(v):
    return jnp.broadcast_to(v[:, None], (v.shape[0], 128)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# the DP kernel
# ---------------------------------------------------------------------------

INF = 1 << 28


def _make_dp_kernel(k: int):
    import jax.experimental.pallas as pl  # deferred

    def kernel(data_ref, clen_ref, cand_ref, dep_lit_ref, runcost_ref,
               ddep_ref, rdinfo_ref, dbase_ref, terms_ref, valid_ref,
               hist_ref, cost_scr, plen_scr, pdist_scr, litc_scr,
               data_scr):
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        iota32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB + 264, 128), 0)
        clen = clen_ref[0, 0][None, :]          # (1, 128) live bytes
        # the bytes arrive chunk-per-lane already (they ride the
        # candidate kernel's blk relayout as an extra row — a separate
        # XLA-side retile measured 35 ms/batch); int8 → masked int32
        # upcast happens on VMEM vregs
        data_scr[...] = data_ref[0].astype(jnp.int32) & 0xFF
        cost_scr[...] = jnp.where(rows == 0, 0, INF)
        plen_scr[...] = jnp.zeros((NB + 264, 128), jnp.int32)
        pdist_scr[...] = jnp.ones((NB + 264, 128), jnp.int32)

        # literal costs for every position at once: one-hot over the 256
        # byte values, each iteration a dense (NB, 128) select
        def lit_body(v, acc):
            depv = dep_lit_ref[pl.ds(v, 1)]     # (1, 128) replicated row
            return acc + jnp.where(data_scr[...] == v, depv, 0)

        litc_scr[...] = jax.lax.fori_loop(0, 256, lit_body,
                                          jnp.zeros((NB, 128), jnp.int32))

        def decade_of(dist):
            """Distance decade, closed form (no tables)."""
            dm1 = dist - 1
            bl = jnp.zeros_like(dist)
            for t in range(16):
                bl = bl + (dm1 >= (1 << t)).astype(jnp.int32)
            hi = (dm1 >> jnp.maximum(bl - 2, 0)) & 1
            return jnp.where(dist <= 4, dm1, 2 * (bl - 1) + hi)

        rc = runcost_ref[...]                   # (256, 128), index L-3

        def fwd(i, _):
            ci = cost_scr[pl.ds(i, 1)]          # (1, 128)
            # literal edge i → i+1
            lc = ci + litc_scr[pl.ds(i, 1)]
            old = cost_scr[pl.ds(i + 1, 1)]
            ok = (i < clen)
            bet = ok & (lc < old)
            cost_scr[pl.ds(i + 1, 1)] = jnp.where(bet, lc, old)
            plen_scr[pl.ds(i + 1, 1)] = jnp.where(
                bet, 1, plen_scr[pl.ds(i + 1, 1)])
            pdist_scr[pl.ds(i + 1, 1)] = jnp.where(
                bet, 0, pdist_scr[pl.ds(i + 1, 1)])
            for kk in range(k):
                candrow = cand_ref[0, kk, pl.ds(i, 1)]   # (1, 128)
                distk = candrow >> 9
                runk = candrow & 0x1FF
                dd = decade_of(distk)
                dcost = jnp.sum(
                    jnp.where(iota32 == dd, ddep_ref[...], 0), axis=0,
                    keepdims=True)              # (1, 128)
                base = ci + dcost
                news = base + rc
                reach = jnp.minimum(runk, clen - i)
                mask = (iota256 + 3 <= reach) & ok
                news = jnp.where(mask, news, INF)
                olds = cost_scr[pl.ds(i + 3, 256)]
                bet2 = news < olds
                cost_scr[pl.ds(i + 3, 256)] = jnp.where(bet2, news, olds)
                plen_scr[pl.ds(i + 3, 256)] = jnp.where(
                    bet2, iota256 + 3, plen_scr[pl.ds(i + 3, 256)])
                pdist_scr[pl.ds(i + 3, 256)] = jnp.where(
                    bet2, distk, pdist_scr[pl.ds(i + 3, 256)])
            return 0

        jax.lax.fori_loop(0, NB, fwd, 0)

        # backtrack: descending positions, per-lane path cursor; terms are
        # stored at their END position so the valid-masked array is in
        # stream order for the bit packer
        terms_ref[...] = jnp.zeros((1, NB, 128), jnp.int32)
        valid_ref[...] = jnp.zeros((1, NB, 128), jnp.int32)
        # per-tile symbol histogram (term frequencies for the tree build)
        # accumulated in-kernel: one-hot adds instead of device scatters,
        # split by domain (lit/run symbols < 288, distance decades ride
        # rows 288…320) so each step scans 320 rows, not 2×384
        hist_ref[...] = jnp.zeros((1, 384, 128), jnp.int32)
        iota288 = jax.lax.broadcasted_iota(jnp.int32, (288, 128), 0)

        def bwd(s, nxt):
            i = NB + 1 - s                      # NB … 1
            on = (nxt == i) & (i <= clen)
            ln = plen_scr[pl.ds(i, 1)]          # (1, 128)
            dist = pdist_scr[pl.ds(i, 1)]
            is_lit = ln == 1
            byte = data_scr[pl.ds(i - 1, 1)]
            rinfo = jnp.sum(
                jnp.where(iota256 == jnp.maximum(ln - 3, 0),
                          rdinfo_ref[...], 0), axis=0, keepdims=True)
            rd = rinfo & 31
            rbase = (rinfo >> 5) & 0x1FF
            dd = decade_of(dist)
            dbase_v = jnp.sum(
                jnp.where(iota32 == dd, dbase_ref[...], 0), axis=0,
                keepdims=True)
            lit_term = jnp.int32(-134217728) + byte      # 0xF8000000 | b
            match_term = ((dd << 27) | ((dist - dbase_v) << 14)
                          | ((ln - rbase) << 9) | 0x100 | rd)
            term = jnp.where(is_lit, lit_term, match_term)
            terms_ref[0, pl.ds(i - 1, 1)] = jnp.where(
                on, term, terms_ref[0, pl.ds(i - 1, 1)])
            valid_ref[0, pl.ds(i - 1, 1)] = jnp.where(
                on, 1, valid_ref[0, pl.ds(i - 1, 1)])
            s1 = jnp.where(is_lit, byte, 257 + rd)       # (1, 128)
            s1 = jnp.where(on, s1, -1)
            s2 = jnp.where(on & ~is_lit, dd, -1)
            hist_ref[0, :288] = (hist_ref[0, :288]
                                 + (iota288 == s1).astype(jnp.int32))
            hist_ref[0, 288:320] = (hist_ref[0, 288:320]
                                    + (iota32 == s2).astype(jnp.int32))
            return jnp.where(on, i - ln, nxt)

        jax.lax.fori_loop(1, NB + 1, bwd, clen + 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tpi"))
def optimal_parse_device(data2, clen, cand, dep_lit, runcost, ddep, rdinfo,
                         dbase, *, k: int = KCAND, interpret: bool = False,
                         tpi: int | None = None):
    """Run the DP kernel over all chunk tiles.

    Args:
      data2: ``(Tc, NB, 128)`` int8 — chunk bytes, chunk-per-lane
        (the candidate kernel's blk data row; the kernel upcasts with a
        0xFF mask on VMEM vregs).
      clen: ``(Tc, 8, 128)`` int32 — live bytes per chunk (row 0).
      cand: ``(Tc, k, NB, 128)`` int32 — packed ``dist<<9 | run`` in
        chunk-per-lane tiles (the candidate kernel's native output).
      dep_lit/runcost/ddep/rdinfo/dbase: cost tables replicated to 128
        lanes: ``(256,128)/(256,128)/(32,128)/(256,128)/(32,128)``.

    Returns ``(terms (Tc, NB, 128) int32, valid (Tc, NB, 128) int32,
    freq (320,) int32)`` — packed ``DeflatorTerm`` tokens at their
    chunk-end positions plus the in-kernel symbol histogram.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tc = data2.shape[0]
    kernel = _make_dp_kernel(k)
    # with ``tpi`` (tiles per image) the cost tables are PER IMAGE —
    # stacked as (B·rows, 128) with the index_map selecting the owning
    # image's block (tile // tpi); the kernel body is unchanged
    if tpi is None:
        img = lambda t: (0, 0)
    else:
        img = lambda t: (t // tpi, 0)
    terms, valid, hist = pl.pallas_call(
        kernel,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((1, NB, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, NB, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), img, memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NB, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 384, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tc, NB, 128), jnp.int32),
            jax.ShapeDtypeStruct((Tc, NB, 128), jnp.int32),
            jax.ShapeDtypeStruct((Tc, 384, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NB + 264, 128), jnp.int32),
            pltpu.VMEM((NB + 264, 128), jnp.int32),
            pltpu.VMEM((NB + 264, 128), jnp.int32),
            pltpu.VMEM((NB, 128), jnp.int32),
            pltpu.VMEM((NB, 128), jnp.int32),
        ],
        interpret=interpret,
    )(data2, clen, cand, dep_lit, runcost, ddep, rdinfo, dbase)
    if tpi is not None:
        hist_img = jnp.sum(hist.reshape(Tc // tpi, tpi, 384, 128),
                           axis=(1, 3))[:, :320]
        return terms, valid, hist_img
    return terms, valid, jnp.sum(hist, axis=(0, 2))[:320]


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "tpi", "iters"))
def _dp_iterated(data2, clen, cand, dep_b, run_b, dde_b, rdinfo_r, dbase_r,
                 *, k: int, interpret: bool, tpi: int, iters: int):
    """All DP iterations + intermediate Depths refreshes in ONE program.

    The eager per-iteration loop paid a program dispatch per DP run plus
    one per Depths update (~27 ms of dispatch-dominated small-kernel work
    each); fusing keeps the whole refinement on the device queue.
    """
    B = dep_b.shape[0]

    def stack128(t, rows):
        return jnp.broadcast_to(
            t[:, :, None], (B, rows, 128)).reshape(B * rows, 128
                                                   ).astype(jnp.int32)

    terms = valid = hist_img = None
    for it in range(iters):
        terms, valid, hist_img = optimal_parse_device(
            data2, clen, cand,
            stack128(dep_b, 256), stack128(run_b, 256),
            stack128(dde_b, 32), rdinfo_r, dbase_r,
            k=k, interpret=interpret, tpi=tpi)
        if it + 1 < iters:
            dep_b, run_b, dde_b = jax.vmap(_device_depths_update)(
                hist_img, dep_b, run_b, dde_b)
    return terms, valid, hist_img


def optimal_pipeline(data: bytes, level: int = 9, pitch: int = 0,
                     bpp: int = 4, interpret: bool = False):
    """Device part of the optimal-parse deflate: candidates → iterated DP
    → packed bitstream atoms.  Returns ``(atoms, total_bits, lit_l,
    dist_l, n_terms)`` with ``atoms``/``total_bits``/``n_terms`` still on
    device — the bench times this (plus a scalar sync) as the per-chip
    encode number; host assembly/IO happens in
    :func:`deflate_device_optimal`.

    The ``Depths`` cost model is warm-started from the same native sample
    pass that seeds the distance menu, replacing the generic-start
    iteration doubling (the reference's ``Depths.init`` generic seed,
    ``…Matches.Depths.swift:28-45``) with the level's plain iteration
    count.
    """
    strategy, attempts, goal, iterations = search_parameters(level)
    n = len(data)
    menu = default_menu(n, bpp=bpp, pitch=pitch)
    extra, lit_f, dist_f = _sample_stats(data)
    menu += [d for d in extra if d not in menu]
    menu = tuple(sorted(menu))

    chunks = -(-n // NB)
    Tc = -(-chunks // 128)
    Npad = Tc * 128 * NB
    # one host→device staging serves the candidate kernel and the DP
    # relayout (the tunnel transfer dwarfs the on-device transposes)
    dbuf = stage_buf(data, Tc)
    cand, data2 = candidates_device(data, menu, Tc, interpret, dbuf=dbuf)
    clen = np.zeros((Tc, 8, 128), np.int32)
    for c in range(chunks):
        clen[c // 128, 0, c % 128] = min(NB, n - c * NB)

    depths = Depths()
    if lit_f is not None and int(lit_f.sum()) > 64:
        lit_f = lit_f.copy()
        lit_f[256] += 1
        depths.update(lengths_from_frequencies(lit_f, 15, force=True),
                      lengths_from_frequencies(dist_f, 15, force=False))
    iters = max(1, iterations * (2 if depths.generic else 1))
    dep_lit, runcost, ddep, rdinfo, dbase = _tables_from_depths(depths)
    dep_lit_d = jnp.asarray(dep_lit)
    runcost_d = jnp.asarray(runcost)
    ddep_d = jnp.asarray(ddep)
    rdinfo_r = _rep128(rdinfo)
    dbase_r = _rep128(dbase)
    clen_j = jnp.asarray(clen)
    terms = valid = hist = None
    for it in range(iters):
        terms, valid, hist = optimal_parse_device(
            data2, clen_j, cand,
            _rep128_dev(dep_lit_d), _rep128_dev(runcost_d),
            _rep128_dev(ddep_d), rdinfo_r, dbase_r,
            k=KCAND, interpret=interpret)
        if it + 1 < iters:
            # intermediate cost refresh stays on device — no host fetch
            dep_lit_d, runcost_d, ddep_d = _device_depths_update(
                hist, dep_lit_d, runcost_d, ddep_d)
    # ONE histogram fetch: the final canonical trees are host-built
    freq = np.asarray(hist).astype(np.int64)
    freq[256] += 1
    lit_l = lengths_from_frequencies(freq[:286], 15, force=True)
    dist_l = lengths_from_frequencies(freq[288:318], 15, force=False)

    # emit: single dynamic block, device bit packing.  On match-rich
    # content only a small fraction of the (Tc·NB·128) positions hold a
    # live term, so the terms are compacted first — the DP histogram
    # gives the exact term count for free (one row-0…287 entry per term)
    # and pack then touches n_terms elements instead of the grid
    # (measured 164 ms → ~25 ms on a 1 MB match-rich image).  On
    # high-entropy content terms ≈ bytes and the compaction itself would
    # be a grid-sized near-identity scatter — skipped, pack runs over the
    # grid positions in stream order directly.
    from .deflate import (_emit_tables, max_term_bits, pack_stream32,
                          pack_stream32_short)

    tables = _emit_tables(lit_l, dist_l)
    n_terms = int(freq[:288].sum()) - 1          # minus the injected EOB
    grid = Tc * 128 * NB
    if n_terms > grid // 2:
        tf = jnp.transpose(terms, (0, 2, 1)).reshape(-1)
        vm = jnp.transpose(valid, (0, 2, 1)).reshape(-1) != 0
        count = jnp.asarray(np.int32(n_terms))
    else:
        cap = max(512, 1 << (n_terms + 8 - 1).bit_length())
        tf, count = _compact_terms(terms, valid, cap=cap)
        vm = jnp.arange(cap, dtype=jnp.int32) < count
    pack = (pack_stream32_short
            if max_term_bits(lit_l, dist_l, freq) <= 33 else pack_stream32)
    atoms, total = pack(
        jax.lax.bitcast_convert_type(tf, jnp.uint32), vm, *tables)
    return atoms, total, lit_l, dist_l, count


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_batch(terms_r, valid_r, *, cap: int):
    """Whole-batch term compaction (module-level jit: a fresh
    ``jax.vmap`` closure per call would re-trace every encode)."""
    return jax.vmap(functools.partial(_compact_terms, cap=cap))(
        terms_r, valid_r)


@functools.partial(jax.jit, static_argnames=("cap",))
def _compact_terms(terms, valid, *, cap: int):
    """Order-preserving compaction of the DP kernel's term grid.

    ``terms``/``valid``: ``(Tc, NB, 128)`` int32 at chunk-end positions.
    Returns ``(ctms (cap,) int32 stream-ordered, count)``.
    """
    from .inflate_checkpoint import _cumsum_mxu

    tf = jnp.transpose(terms, (0, 2, 1)).reshape(-1)
    vf = jnp.transpose(valid, (0, 2, 1)).reshape(-1) != 0
    pos = _cumsum_mxu(vf.astype(jnp.int32)) - 1
    keep = vf & (pos < cap)
    ctms = jnp.zeros(cap, jnp.int32).at[
        jnp.where(keep, pos, cap)
    ].set(jnp.where(keep, tf, 0), mode="drop")
    return ctms, jnp.sum(vf.astype(jnp.int32))


def deflate_device_optimal(data: bytes, level: int = 9,
                           pitch: int = 0, bpp: int = 4,
                           interpret: bool | None = None,
                           return_parts: bool = False):
    """One-shot zlib deflate at levels 8–13 with the device DP parse.

    Host work: distance-menu selection, Huffman tree construction from the
    (tiny) device histogram, and header serialization — the same
    host/device split as the reference's table build vs. hot loop.
    Emits a single dynamic block (the indexed decoder's fast-path shape).

    Cites: ``DeflatorMatches.minimize/explore``
    (``Sources/LZ77/Deflator/LZ77.DeflatorMatches.swift:265-379``),
    ``Depths`` iteration (``…Matches.Depths.swift:53-97``).
    """
    from ..lz77.checksums import adler32
    from ..lz77.deflate import _write_stored_block
    from ..utils.bits import BitWriter
    from .deflate import _write_block_header_and_tables, _append_bits
    from ..lz77.huffman import canonical_codes
    from ..utils.bits import reverse_bits

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = len(data)
    out = BitWriter()
    cmf = 0x78
    flg = ~((cmf * 256) % 31) & 31
    out.write_bytes(bytes([cmf, flg]))
    if n < 3:
        _write_stored_block(out, data, True)
        out.pad_to_byte()
        return bytes(out.drain()) + adler32(data).to_bytes(4, "big")

    atoms, total, lit_l, dist_l, count = optimal_pipeline(
        data, level=level, pitch=pitch, bpp=bpp, interpret=interpret)
    # fetch only the live atoms — the tunnel runs at ~10 MB/s (an
    # unsliced padded-grid fetch measured 2.9 s for a 1 MB image)
    na = (int(total) + 31) // 32 + 1
    from .deflate import atoms32_to_bytes

    body = atoms32_to_bytes(np.asarray(atoms[:na]), int(total))
    _write_block_header_and_tables(out, lit_l, dist_l, True)
    _append_bits(out, body, int(total))
    lit_codes = canonical_codes(np.asarray(lit_l, np.int64))
    out.write(reverse_bits(int(lit_codes[256]), int(lit_l[256])),
              int(lit_l[256]))
    out.pad_to_byte()
    stream = bytes(out.drain()) + adler32(data).to_bytes(4, "big")
    if return_parts:
        return stream, int(np.asarray(count))
    return stream


def _batch_scatter_pack(lo_b, hi_b, nbv, offs, spans: tuple,
                        natoms_img: int):
    """Per-image scatter packs from grid-order bit offsets, one program.

    ``lo_b/hi_b/nbv/offs``: ``(B, n)`` int32 — each image's term bit
    patterns, masked bit counts (0 = dead slot), and within-image stream
    bit offsets (ANY element order — a scatter's offsets are order-
    free).  The scatters stay PER IMAGE on purpose: a round-5 variant
    that packed the whole batch into one ``B·natoms_img`` buffer
    measured ~1.7× slower — scatter cost on this chip rises from ~8 to
    ~13+ ns/index once the target table leaves the tens-of-MB range.
    Placement math is identical to
    :func:`swift_png_tpu.ops.deflate.pack_bits32`.
    """
    B, n = nbv.shape
    a0 = offs >> 5
    sub = offs & 31
    nsub = (32 - sub) & 31
    vals = [
        lo_b << sub,
        jnp.where(sub == 0, 0,
                  ((lo_b >> 1) & 0x7FFFFFFF) >> (nsub - 1)) | (hi_b << sub),
        jnp.where(sub == 0, 0, ((hi_b >> 1) & 0x7FFFFFFF) >> (nsub - 1)),
    ]
    atoms_all = []
    for i in range(B):
        atoms = jnp.zeros(natoms_img, jnp.int32)
        for k in range(spans[i]):
            live = (32 * k < sub[i] + nbv[i]) & (nbv[i] > 0)
            tgt = jnp.where(live, a0[i] + k, natoms_img)
            atoms = atoms.at[tgt].add(
                jnp.where(live, vals[k][i], 0), mode="drop")
        atoms_all.append(atoms)
    totals = jnp.sum(nbv, axis=1)
    return jnp.stack(atoms_all), totals


@functools.partial(jax.jit, static_argnames=("spans", "interpret"))
def _emit_pack_grid(terms_r, valid_r, tabs_small, *, spans: tuple,
                    interpret: bool = False):
    """Fused batched term emission → one whole-batch scatter pack, ONE
    compiled program, straight from the DP grid layout.

    The round-4 version packed per image from a stream-order flatten:
    the flatten's (NB, 128) transposes cost ~35 ms/batch (relayout-
    priced) and the B separate pack programs each paid the multi-ms
    dispatch floor.  A scatter's offsets are ORDER-FREE, so the grid
    never needs transposing: element ``[t, j, l]``'s stream bit offset =
    its column's exclusive prefix (a tiny (B, TPI·128) cumsum in
    (tile, lane) stream order) + its intra-column prefix (a dense
    axis-1 cumsum) — then one scatter covers the whole batch.
    """
    from .deflate_emit import emit_terms_batch

    B, TPI_, NBr, L = terms_r.shape
    Tc = B * TPI_
    slots = TPI_ * NBr * L
    tabs = jnp.broadcast_to(tabs_small[:, :, None],
                            (B, tabs_small.shape[1], 128))
    lo, hi, nb = emit_terms_batch(
        terms_r.reshape(Tc, NBr, L), tabs,
        jnp.full((1,), TPI_, jnp.int32), interpret=interpret)
    vm = valid_r.reshape(Tc, NBr, L) != 0
    nbv = jnp.where(vm, nb, 0)
    intra = jnp.cumsum(nbv, axis=1) - nbv            # (Tc, NB, L) excl.
    colsum = jnp.sum(nbv, axis=1)                    # (Tc, L)
    colsum2 = colsum.reshape(B, TPI_ * L)            # (tile, lane) order
    colbase = jnp.cumsum(colsum2, axis=1) - colsum2
    offs = intra + colbase.reshape(Tc, 1, L)
    natoms_img = (3 * slots) // 2 + 8
    reshp = lambda x: x.reshape(B, slots)
    atoms2, totals = _batch_scatter_pack(
        reshp(lo), reshp(hi), reshp(nbv), reshp(offs), spans, natoms_img)
    return ([atoms2[i] for i in range(B)],
            [totals[i] for i in range(B)])


@functools.partial(jax.jit, static_argnames=("spans", "interpret"))
def _emit_pack_compact(ctms_b, counts_b, tabs_small, *, spans: tuple,
                       interpret: bool = False):
    """Fused emission + one whole-batch scatter pack over compacted
    per-image term rows (same single-scatter discipline as
    :func:`_emit_pack_grid`)."""
    from .deflate_emit import emit_terms_batch

    B, cap = ctms_b.shape
    tabs = jnp.broadcast_to(tabs_small[:, :, None],
                            (B, tabs_small.shape[1], 128))
    flat = ctms_b.reshape(-1)
    blk = 1024 * 128
    nb_blk = 1024
    while cap % blk and nb_blk >= 16:
        blk //= 2
        nb_blk //= 2
    lo, hi, nb = emit_terms_batch(
        flat.reshape(flat.shape[0] // blk, nb_blk, 128), tabs,
        jnp.full((1,), cap // blk, jnp.int32), interpret=interpret)
    lo_b = lo.reshape(B, cap)
    hi_b = hi.reshape(B, cap)
    nb_b = nb.reshape(B, cap)
    vm = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts_b[:, None]
    nbv = jnp.where(vm, nb_b, 0)
    offs = jnp.cumsum(nbv, axis=1) - nbv
    natoms_img = (3 * cap) // 2 + 8
    atoms2, totals = _batch_scatter_pack(lo_b, hi_b, nbv, offs, spans,
                                         natoms_img)
    return ([atoms2[i] for i in range(B)],
            [totals[i] for i in range(B)])


def batch_layout(ns: list[int]):
    """(stride, Ntot, TPI) for a batch of stream lengths: every image is
    padded to a whole number of 128-chunk tiles so DP tables and menus
    can be block-indexed by ``tile // TPI``."""
    n_max = max(ns)
    CPI = -(-n_max // NB)
    TPI = -(-CPI // 128)
    stride = TPI * 128 * NB
    return stride, len(ns) * stride, TPI


def optimal_pipeline_batch(datas: list[bytes], level: int = 9,
                           pitch: int = 0, bpp: int = 4,
                           interpret: bool = False, dbuf=None):
    """Batched device optimal parse: B independent streams, ONE program
    per stage, per-image cost tables and histograms.

    A single-image encode pays ~90 ms of fixed cost (the native sample
    pass for the menu/warm start, one histogram round trip, the final
    sync) regardless of size; batching shares the menu/warm start across
    the batch (images in one bucket are statistically similar — SURVEY
    §2.4.3's broadcast of shared state), keeps per-image DP cost tables
    via block-indexed kernel inputs, and fetches all B histograms in one
    round trip.

    Returns ``(atoms_list, totals, trees_list, counts)`` — per-image
    device atom buffers + bit totals; assembly in
    :func:`deflate_device_optimal_batch`.
    """
    strategy, attempts, goal, iterations = search_parameters(level)
    B = len(datas)
    stride, Ntot, TPI = batch_layout([len(d) for d in datas])

    # PER-IMAGE menus and Depths warm starts (a shared menu measured
    # catastrophic on mixed batches — a periodic-text image compressed
    # 64× worse without its sampled period distance)
    menus, lit_fs, dist_fs = [], [], []
    for d in datas:
        m = default_menu(len(d), bpp=bpp, pitch=pitch)
        extra, lit_f, dist_f = _sample_stats(d)
        m += [x for x in extra if x not in m]
        menus.append(tuple(sorted(m)))
        lit_fs.append(lit_f)
        dist_fs.append(dist_f)
    dmax = -(-max(max((len(m) for m in menus), default=1), 1)
             // DMAX_STEP) * DMAX_STEP

    if dbuf is None:
        # host staging; callers with device-resident rows (e.g. the
        # filter stage's output) pass ``dbuf`` and skip this upload —
        # measured ~300 ms of a 1.1 s 8-image batch on the tunnel
        buf = np.zeros(Ntot, np.uint8)
        for i, d in enumerate(datas):
            buf[i * stride: i * stride + len(d)] = np.frombuffer(
                d, np.uint8)
        dbuf = jnp.asarray(buf)
    assert dbuf.shape[0] == Ntot, (dbuf.shape, Ntot)
    nvec = jnp.asarray(np.array([len(d) for d in datas], np.int32))

    if interpret:
        cands = []
        for i in range(B):
            img = dbuf[i * stride: (i + 1) * stride]
            runs, dists = menu_candidates(img, nvec[i], menu=menus[i],
                                          k=KCAND)
            cands.append((dists << 9) | runs)
        cand_flat = jnp.concatenate(cands, axis=1)     # (K, Ntot)
        cand = jnp.transpose(
            cand_flat.reshape(KCAND, B * TPI, 128, NB), (1, 0, 3, 2))
        data2 = jnp.transpose(
            jax.lax.bitcast_convert_type(dbuf[:Ntot], jnp.int8)
            .reshape(B * TPI, 128, NB), (0, 2, 1))
    else:
        dv = np.zeros((B, dmax), np.int32)
        cv = np.zeros((B, dmax), np.int32)
        for i, m in enumerate(menus):
            dv[i, :len(m)] = list(m)
            cv[i, :len(m)] = [int(C.DISTANCE_DECADE[d]) for d in m]
        cand, cblk = menu_candidates_pallas_batch(
            jnp.asarray(dv), jnp.asarray(cv), dbuf, nvec,
            dmax=dmax, stride=stride)
        data2 = cblk[:, dmax, :NB]
    Tc = B * TPI
    clen = np.zeros((Tc, 8, 128), np.int32)
    for i, d in enumerate(datas):
        for c in range(-(-len(d) // NB)):
            clen[i * TPI + c // 128, 0, c % 128] = min(
                NB, len(d) - c * NB)
    clen_j = jnp.asarray(clen)

    dep_rows, run_rows, dde_rows = [], [], []
    all_warm = True
    rdinfo = dbase = None
    for i in range(B):
        depths = Depths()
        lit_f, dist_f = lit_fs[i], dist_fs[i]
        if lit_f is not None and int(lit_f.sum()) > 64:
            lit_f = lit_f.copy()
            lit_f[256] += 1
            depths.update(
                lengths_from_frequencies(lit_f, 15, force=True),
                lengths_from_frequencies(dist_f, 15, force=False))
        all_warm = all_warm and not depths.generic
        dep_lit, runcost, ddep, rdinfo, dbase = _tables_from_depths(depths)
        dep_rows.append(dep_lit)
        run_rows.append(runcost)
        dde_rows.append(ddep)
    iters = max(1, iterations * (1 if all_warm else 2))
    dep_b = jnp.asarray(np.stack(dep_rows).astype(np.int32))
    run_b = jnp.asarray(np.stack(run_rows).astype(np.int32))
    dde_b = jnp.asarray(np.stack(dde_rows).astype(np.int32))
    rdinfo_r = _rep128(rdinfo)
    dbase_r = _rep128(dbase)

    terms, valid, hist_img = _dp_iterated(
        data2, clen_j, cand, dep_b, run_b, dde_b, rdinfo_r, dbase_r,
        k=KCAND, interpret=interpret, tpi=TPI, iters=iters)
    terms_r = terms.reshape(B, TPI, NB, 128)
    valid_r = valid.reshape(B, TPI, NB, 128)

    freqs = np.asarray(hist_img).astype(np.int64)      # ONE fetch (B, 320)
    from .deflate import (_emit_tables, max_term_bits, pack_stream32,
                          pack_stream32_short)

    grid = TPI * 128 * NB
    # the histogram gives each image's exact term count (one lit/run
    # symbol per term) before any further device work is dispatched
    n_terms = [int(freqs[i][:288].sum()) for i in range(B)]
    n_terms_max = max(max(n_terms), 1)
    skip_compact = n_terms_max > grid // 2
    if not skip_compact:
        # match-rich batch: compaction shrinks the pack to the live
        # terms; literal-dominated batches (terms ≈ bytes) skip it —
        # the near-identity grid-sized scatter measured ~89 ms/batch —
        # and pack the grid positions in stream order inside
        # _emit_pack_grid instead
        cap = max(512, 1 << (n_terms_max + 8 - 1).bit_length())
        ctms_b, counts_b = _compact_batch(terms_r, valid_r, cap=cap)
    # host tree build AFTER the device compaction is enqueued: the
    # package-merge for B images (~19 ms host) overlaps the device queue
    trees = []
    emit_rows = []
    shorts = []
    for i in range(B):
        freq = freqs[i].copy()
        freq[256] += 1
        lit_l = lengths_from_frequencies(freq[:286], 15, force=True)
        dist_l = lengths_from_frequencies(freq[288:318], 15, force=False)
        trees.append((lit_l, dist_l))
        emit_rows.append(_emit_tables(lit_l, dist_l))
        shorts.append(max_term_bits(lit_l, dist_l, freqs[i]) <= 33)
    # term emission + packing run as ONE fused program: a batched
    # sublane one-hot emit kernel (the pack_terms32 route cost two
    # ~8.6 ns/term gathers per image) feeding per-image scatter packs —
    # every intermediate composed at the Python level would pay this
    # tunnel's ~10-30 ms per-dispatch cost
    from .deflate_emit import pack_emit_table

    # upload only (B, 320) int32 — the tunnel measured ~1 s for the
    # lane-broadcast form; the broadcast happens on device in the
    # fused pack program
    tabs_small = jnp.asarray(np.stack(
        [pack_emit_table(*emit_rows[i]) for i in range(B)]))
    spans = tuple(2 if s else 3 for s in shorts)
    counts = []
    if skip_compact:
        atoms_list, totals = _emit_pack_grid(
            terms_r, valid_r, tabs_small, spans=spans,
            interpret=interpret)
        counts = [jnp.asarray(np.int32(n_terms[i])) for i in range(B)]
    elif cap % 1024 == 0:
        atoms_list, totals = _emit_pack_compact(
            ctms_b, counts_b, tabs_small, spans=spans,
            interpret=interpret)
        counts = [counts_b[i] for i in range(B)]
    else:
        # tiny per-image slot counts: the kernel's 8-sublane steps
        # don't fit — keep the gather route (cost is tiny at this size)
        from .deflate import pack_stream32, pack_stream32_short

        atoms_list, totals = [], []
        for i in range(B):
            vm = jnp.arange(cap, dtype=jnp.int32) < counts_b[i]
            counts.append(counts_b[i])
            pack = pack_stream32_short if shorts[i] else pack_stream32
            atoms, total = pack(
                jax.lax.bitcast_convert_type(ctms_b[i], jnp.uint32), vm,
                *emit_rows[i])
            atoms_list.append(atoms)
            totals.append(total)
    return atoms_list, totals, trees, counts


_STRICT_FULL_N = 1 << 17      # ≤128 KB: the size probe IS a full native run
_STRICT_WINDOW = 1 << 15      # sampled-window width for larger images
_STRICT_MARGIN = 1.02         # route native when device > est × margin


def _strict_estimate(data: bytes, level: int):
    """Native-parse size probe for the strict size policy.

    Small images are encoded outright (the probe doubles as the
    replacement stream); larger ones estimate bits/byte from three
    scattered windows — measured on the 28 reference baselines the
    windowed estimate tracks the true native size within −8 %…+2 %.
    """
    from .. import native

    n = len(data)
    if n <= _STRICT_FULL_N:
        return ("full", native.deflate(data, level, "zlib"))
    W = _STRICT_WINDOW
    tot_c = tot_n = 0
    for s in (0, (n - W) // 2, n - W):
        w = data[s: s + W]
        tot_c += len(native.deflate(w, level, "ios"))
        tot_n += len(w)
    return ("bpb", tot_c / tot_n)


def deflate_device_optimal_batch(datas: list[bytes], level: int = 9,
                                 pitch: int = 0, bpp: int = 4,
                                 interpret: bool | None = None,
                                 dbuf=None,
                                 size_policy: str = "device") -> list[bytes]:
    """Batched one-shot zlib deflate at levels 8–13 (device DP parse).

    Per-image streams are bit-exact with what a caller would get from
    per-image :func:`deflate_device_optimal` up to the shared menu/warm
    start; all device→host transfers are batched (one histogram fetch,
    one totals fetch, one concatenated-atoms fetch).

    ``size_policy="strict"`` enforces the north star's "compressed
    output ≤ the reference's at the same level" on content the distance
    menu cannot serve (long-range nearest-occurrence residuals — see
    ``tests/data/device_parse_goldens.json``): a native-parse size probe
    per image runs in a thread pool OVERLAPPED with the device pipeline
    (ctypes releases the GIL), and any image whose device stream exceeds
    the probe by >2 % is re-encoded by the native tier — the encode-side
    analog of the decode tier dispatch.  ``"device"`` skips the probe
    and always ships the device parse.
    """
    from ..lz77.checksums import adler32
    from ..lz77.deflate import _write_stored_block
    from ..utils.bits import BitWriter, reverse_bits
    from .deflate import _write_block_header_and_tables, _append_bits
    from ..lz77.huffman import canonical_codes
    from .. import native as _native

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    est_futs = {}
    pool = None
    if size_policy == "strict" and _native.available():
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=4)
        est_futs = {i: pool.submit(_strict_estimate, d, min(level, 13))
                    for i, d in enumerate(datas) if len(d) >= 3}
    small = [i for i, d in enumerate(datas) if len(d) < 3]
    big = [i for i in range(len(datas)) if i not in small]
    out: list[bytes | None] = [None] * len(datas)
    for i in small:
        w = BitWriter()
        w.write_bytes(bytes([0x78, ~((0x78 * 256) % 31) & 31]))
        _write_stored_block(w, datas[i], True)
        w.pad_to_byte()
        out[i] = bytes(w.drain()) + adler32(datas[i]).to_bytes(4, "big")
    # ragged batches: every image in one pipeline call pads to the
    # largest image's tile count (batch_layout), so a 1 MB + 64 KB mix
    # would pay ~16× wasted DP/candidate work on the small image —
    # bucket by pow2 tile count and run the pipeline per bucket
    def _bucket(i: int) -> int:
        cpi = -(-len(datas[i]) // NB)
        tiles = max(1, -(-cpi // 128))
        return tiles.bit_length()

    buckets: dict[int, list[int]] = {}
    for i in big:
        buckets.setdefault(_bucket(i), []).append(i)
    from .deflate import atoms32_to_bytes

    for bkey in sorted(buckets):
        grp = buckets[bkey]
        sub = [datas[i] for i in grp]
        gbuf = dbuf if (not small and len(buckets) == 1) else None
        atoms_list, totals, trees, _ = optimal_pipeline_batch(
            sub, level=level, pitch=pitch, bpp=bpp, interpret=interpret,
            dbuf=gbuf)
        tot_h = np.asarray(jnp.stack(totals))          # one tiny fetch
        sliced = [a[: (int(t) + 31) // 32 + 1]
                  for a, t in zip(atoms_list, tot_h)]
        cat = np.asarray(jnp.concatenate(sliced))      # one bulk fetch
        offs = np.cumsum([0] + [s.shape[0] for s in sliced])
        for j, i in enumerate(grp):
            body = atoms32_to_bytes(cat[offs[j]: offs[j + 1]],
                                    int(tot_h[j]))
            lit_l, dist_l = trees[j]
            w = BitWriter()
            w.write_bytes(bytes([0x78, ~((0x78 * 256) % 31) & 31]))
            _write_block_header_and_tables(w, lit_l, dist_l, True)
            _append_bits(w, body, int(tot_h[j]))
            lit_codes = canonical_codes(np.asarray(lit_l, np.int64))
            w.write(reverse_bits(int(lit_codes[256]), int(lit_l[256])),
                    int(lit_l[256]))
            w.pad_to_byte()
            out[i] = (bytes(w.drain())
                      + adler32(datas[i]).to_bytes(4, "big"))
    if pool is not None:
        # strict size policy: compare each device stream against its
        # native-parse probe; losers re-encode natively (threaded) and
        # the smaller stream ships
        reroute = []
        for i, fut in est_futs.items():
            kind, est = fut.result()
            if kind == "full":
                if len(est) < len(out[i]):
                    out[i] = est
            elif len(out[i]) > est * len(datas[i]) * _STRICT_MARGIN:
                reroute.append(i)
        if reroute:
            nstreams = list(pool.map(
                lambda i: _native.deflate(datas[i], min(level, 13),
                                          "zlib"), reroute))
            for i, s in zip(reroute, nstreams):
                if len(s) < len(out[i]):
                    out[i] = s
        pool.shutdown()
    return out  # type: ignore[return-value]


def _extra_menu(data: bytes) -> list[int]:
    return _sample_stats(data)[0]


def _sample_stats(data: bytes):
    """(extra menu distances, lit freq, dist freq) from a native sample.

    The native greedy-pass sampler (``spt_sample_stats``) replaces the
    deflate-then-token-walk path (~30 ms of Python per image — the
    batched encoder samples EVERY image, so this must be ~1 ms)."""
    from .. import native

    if native.available() and len(data) >= 4096:
        try:
            return native.sample_stats(data[: 1 << 16], 4, 8)
        except Exception:
            pass
    try:
        return _walk_stats_from_sample(data)
    except Exception:
        return [], None, None


def _walk_stats_from_sample(data: bytes):
    from .. import native

    if not native.available() or len(data) < 4096:
        return [], None, None
    sample = data[: 1 << 16]
    body = native.deflate(sample, 4, "ios")
    return _walk_stats(body, top=8)
