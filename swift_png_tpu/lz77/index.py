"""Checkpoint index for parallel DEFLATE decoding.

The reference inflator is a sequential state machine — one token at a time
(``Sources/LZ77/Inflator/LZ77.InflatorBuffers.Stream.swift:266-381``).  The
TPU decode path instead splits a stream's *output* into fixed ``OB``-byte
units and decodes every unit's token span in lockstep (SPMD over units,
one token per step).  That requires knowing, for each unit, the bit
position of the first token that produces bytes in its span — which is
what this index records.  It is the PNG/DEFLATE analog of sequence
parallelism: the scan dependency (bit position) is checkpointed at encode
or ingest time, and the expensive token decode becomes embarrassingly
parallel.

Index construction is a cheap single pass (done by the encoder for free,
or by :func:`build_index` for arbitrary streams — the same idea as gzip
random-access indexes à la rapidgzip).  Indexed streams remain 100 %
standard zlib/DEFLATE; the index is carried out of band (for PNG, in a
private ancillary ``spIx`` chunk).

v1 scope: streams whose body is a single dynamic-Huffman DEFLATE block —
exactly the shape this framework's encoders emit for device-targeted
images (one big block compresses smaller *and* decodes with one table).
Multi-block and stored-block streams fall back to the general engines.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import constants as C
from .errors import DecompressionError

__all__ = ["CheckpointIndex", "build_index", "INDEX_VERSION", "MATCH_SEG"]

INDEX_VERSION = 1
MATCH_SEG = 64   # output bytes per match-segment (expansion compaction)


@dataclass
class CheckpointIndex:
    """Per-unit decode entry points for one raw-DEFLATE body.

    Unit ``u`` owns output bytes ``[u*ob, (u+1)*ob)``.  Its first token is
    the one containing byte ``u*ob``; ``skip[u]`` bytes of that token
    belong to earlier units and are skipped.  ``n_tokens[u]`` tokens fully
    cover the unit's span (the last may extend past it; the excess belongs
    to the next unit, which re-decodes that token).
    """

    ob: int                    # output bytes per unit
    out_size: int              # total decompressed size
    bit_pos: np.ndarray        # (U,) uint64 — absolute bit of first token
    skip: np.ndarray           # (U,) uint32 — bytes of first token to skip
    n_tokens: np.ndarray       # (U,) uint32 — tokens covering the unit
    lit_lengths: np.ndarray    # (288,) uint8 — literal/run code lengths
    dist_lengths: np.ndarray   # (32,) uint8 — distance code lengths
    end_bit: int               # bit position after the EOB token
    match_bytes: int = 0       # total bytes produced by match tokens
    match_segs: int = -1       # MATCH_SEG-byte segments containing a match
                               # byte (-1 = unknown; sizes the device
                               # expansion's segment compaction)

    @property
    def units(self) -> int:
        return int(self.bit_pos.shape[0])

    @property
    def max_tokens(self) -> int:
        return int(self.n_tokens.max()) if self.units else 0

    def max_span_bytes(self) -> int:
        """Largest compressed span any unit reads (incl. 8-byte lookahead)."""
        ends = np.empty_like(self.bit_pos)
        ends[:-1] = self.bit_pos[1:]
        ends[-1] = self.end_bit
        # a unit re-decodes its tail token (the next unit's first token),
        # which ends at or before the start of the unit-after-next
        tail = np.empty_like(self.bit_pos)
        tail[:-2] = self.bit_pos[2:]
        tail[-2:] = self.end_bit
        spans = (tail >> 3) - (self.bit_pos >> 3) + 1
        # +16: when ob < 259 a 258-run can span three units, so the
        # unit-after-next's first token can BE this unit's tail token —
        # cover its ≤48 bits plus the 56-bit lookahead
        return int(spans.max()) + 16

    # ---- serialization (spIx chunk payload) ----------------------------

    def serialize(self) -> bytes:
        """Compact byte form: header + delta-coded checkpoint records."""
        U = self.units
        out = bytearray()
        out += bytes([INDEX_VERSION])
        out += int(self.ob).to_bytes(4, "big")
        out += int(self.out_size).to_bytes(8, "big")
        out += int(self.end_bit).to_bytes(8, "big")
        out += U.to_bytes(4, "big")
        out += bytes(self.lit_lengths.astype(np.uint8).tobytes())
        out += bytes(self.dist_lengths.astype(np.uint8).tobytes())
        prev = 0
        for u in range(U):
            bp = int(self.bit_pos[u])
            out += (bp - prev).to_bytes(4, "big")
            prev = bp
            out += int(self.skip[u]).to_bytes(2, "big")
            out += int(self.n_tokens[u]).to_bytes(2, "big")
        return bytes(out)

    @classmethod
    def parse(cls, data: bytes) -> "CheckpointIndex":
        if not data or data[0] != INDEX_VERSION:
            raise ValueError("unsupported checkpoint index version")
        ob = int.from_bytes(data[1:5], "big")
        out_size = int.from_bytes(data[5:13], "big")
        end_bit = int.from_bytes(data[13:21], "big")
        U = int.from_bytes(data[21:25], "big")
        o = 25
        lit = np.frombuffer(data[o:o + 288], np.uint8).copy()
        o += 288
        dist = np.frombuffer(data[o:o + 32], np.uint8).copy()
        o += 32
        rec = np.frombuffer(data[o:o + 8 * U], np.uint8).reshape(U, 8)
        deltas = (rec[:, 0].astype(np.uint64) << 24 |
                  rec[:, 1].astype(np.uint64) << 16 |
                  rec[:, 2].astype(np.uint64) << 8 | rec[:, 3])
        bit_pos = np.cumsum(deltas).astype(np.uint64)
        skip = (rec[:, 4].astype(np.uint32) << 8) | rec[:, 5]
        n_tokens = (rec[:, 6].astype(np.uint32) << 8) | rec[:, 7]
        return cls(ob=ob, out_size=out_size, bit_pos=bit_pos, skip=skip,
                   n_tokens=n_tokens, lit_lengths=lit, dist_lengths=dist,
                   end_bit=end_bit)


class _BitWalker:
    """Host scalar bit reader over a raw-DEFLATE body (index building)."""

    def __init__(self, body: bytes):
        self.d = body
        self.pos = 0

    def peek(self, n: int) -> int:
        byte = self.pos >> 3
        w = int.from_bytes(self.d[byte:byte + 7], "little")
        return (w >> (self.pos & 7)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v


def _flat_lut(lengths: np.ndarray, max_len: int):
    from .huffman import decode_table

    return decode_table(np.asarray(lengths, np.int64), max_len)


def build_index(body: bytes, out_size: int, ob: int = 1024,
                ) -> CheckpointIndex | None:
    """Build a checkpoint index for a raw-DEFLATE body.

    Returns ``None`` when the stream is outside the fast path (multiple
    blocks, stored or fixed blocks, or units exceeding the record ranges)
    — callers then use the general engines.  One cheap sequential pass:
    the token *boundaries* are walked, but no output is materialized (the
    reference's hot loop does strictly more work per token,
    ``…InflatorBuffers.Stream.swift:266-381``).
    """
    if out_size == 0 or len(body) < 4:
        return None
    try:
        from .. import native

        if native.available() and ob >= 64:
            try:
                r = native.build_index(body, out_size, ob)
            except native.NativeError:
                # keep the host taxonomy for malformed streams
                raise DecompressionError.invalid_huffman_table()
            if r is not None:
                bit_pos, skip, n_tokens, lit, dist, end_bit, mb, ms = r
                return CheckpointIndex(
                    ob=ob, out_size=out_size, bit_pos=bit_pos,
                    skip=skip.astype(np.uint32),
                    n_tokens=n_tokens.astype(np.uint32),
                    lit_lengths=lit, dist_lengths=dist, end_bit=end_bit,
                    match_bytes=mb, match_segs=ms)
            return None
    except ImportError:
        pass
    except OSError:
        pass
    w = _BitWalker(body)
    final = w.read(1)
    btype = w.read(2)
    if not final or btype != 2:
        return None  # multi-block / stored / fixed → general engine

    # dynamic table description (host parse; ~100 bytes of control plane)
    hlit = w.read(5) + 257
    hdist = w.read(5) + 1
    hclen = w.read(4) + 4
    if hlit > 286 or hdist > 30:
        raise DecompressionError.invalid_huffman_table()
    ml = np.zeros(19, np.int64)
    for i in range(hclen):
        ml[C.CODELENGTH_ORDER[i]] = w.read(3)
    try:
        mlut = _flat_lut(ml, 7)
    except Exception:
        raise DecompressionError.invalid_huffman_table()
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        e = int(mlut[w.peek(7)])
        ln, sym = e >> 16, e & 0xFFFF
        if ln == 0:
            raise DecompressionError.invalid_huffman_table()
        w.pos += ln
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise DecompressionError.invalid_huffman_table()
            lengths += [lengths[-1]] * (3 + w.read(2))
        elif sym == 17:
            lengths += [0] * (3 + w.read(3))
        else:
            lengths += [0] * (11 + w.read(7))
    if len(lengths) != hlit + hdist:
        raise DecompressionError.invalid_huffman_table()
    la = np.array(lengths, np.int64)
    lit_lengths = np.zeros(288, np.int64)
    lit_lengths[:hlit] = la[:hlit]
    dist_lengths = np.zeros(32, np.int64)
    dist_lengths[:hdist] = la[hlit:]
    try:
        litlut = _flat_lut(lit_lengths, 15)
        if np.count_nonzero(dist_lengths):
            distlut = _flat_lut(dist_lengths, 15)
        else:
            distlut = np.zeros(2, np.int64)
    except Exception:
        raise DecompressionError.invalid_huffman_table()

    run_base, run_extra = C.RUN_BASE, C.RUN_EXTRA
    dist_base, dist_extra = C.DISTANCE_BASE, C.DISTANCE_EXTRA

    U = (out_size + ob - 1) // ob
    bit_pos = np.zeros(U, np.uint64)
    skip = np.zeros(U, np.uint32)
    n_tokens = np.zeros(U, np.uint32)
    litlut_l = litlut.tolist()
    distlut_l = distlut.tolist()
    d = body
    pos = w.pos
    o = 0
    unit = 0
    unit_end = ob
    bit_pos[0] = pos
    toks = 0
    match_bytes = 0
    match_segs = 0
    last_seg = -1
    nbits = len(body) * 8
    while True:
        if pos + 15 > nbits and pos + 1 > nbits:
            raise DecompressionError.invalid_huffman_table()
        byte0 = pos >> 3
        window = int.from_bytes(d[byte0:byte0 + 7], "little") >> (pos & 7)
        e = litlut_l[window & 0x7FFF]
        ln, sym = e >> 16, e & 0xFFFF
        if ln == 0 or pos + ln > nbits:
            raise DecompressionError.invalid_huffman_table()
        if sym < 256:
            tpos, tlen = pos, 1
            pos += ln
        elif sym == 256:
            pos += ln
            break
        elif sym > 285:
            raise DecompressionError.invalid_huffman_table()
        else:
            dec = sym - 257
            eb = int(run_extra[dec])
            run = int(run_base[dec]) + ((window >> ln) & ((1 << eb) - 1))
            w2 = window >> (ln + eb)
            e2 = distlut_l[w2 & 0x7FFF]
            dln, dsym = e2 >> 16, e2 & 0xFFFF
            if dln == 0 or dsym > 29:
                raise DecompressionError.invalid_huffman_table()
            db = int(dist_extra[dsym])
            if pos + ln + eb + dln + db > nbits:
                raise DecompressionError.invalid_huffman_table()
            dist = int(dist_base[dsym]) + ((w2 >> dln) & ((1 << db) - 1))
            if dist > o:
                raise DecompressionError.invalid_string_reference()
            match_bytes += run
            s1 = (o + run - 1) // MATCH_SEG
            match_segs += s1 - max(o // MATCH_SEG - 1, last_seg)
            last_seg = s1
            tpos, tlen = pos, run
            pos += ln + eb + dln + db
        toks += 1
        o += tlen
        # token crossed into (or completed) unit(s)
        while o >= unit_end and unit + 1 < U:
            n_tokens[unit] = toks
            unit += 1
            bit_pos[unit] = tpos
            skip[unit] = tlen - (o - unit_end)
            toks = 1 if o > unit_end else 0
            if toks == 0:
                # boundary exactly at token end: next unit starts at the
                # NEXT token
                bit_pos[unit] = pos
                skip[unit] = 0
            unit_end += ob
    n_tokens[unit] = toks
    if o != out_size:
        return None  # declared size mismatch → let the general engine err
    if int(n_tokens.max()) > 0xFFFF or int(skip.max()) > 0xFFFF:
        return None
    if np.any(np.diff(bit_pos.astype(np.int64)) > 0xFFFFFFFF):
        return None
    return CheckpointIndex(
        ob=ob, out_size=out_size, bit_pos=bit_pos, skip=skip,
        n_tokens=n_tokens, lit_lengths=lit_lengths.astype(np.uint8),
        dist_lengths=dist_lengths.astype(np.uint8), end_bit=pos,
        match_bytes=match_bytes, match_segs=match_segs)
