"""Canonical Huffman coding: validation, decode LUTs, and length-limited
code construction.

Behavioral counterpart of ``LZ77.HuffmanTree``
(``Sources/LZ77/HuffmanCoding/LZ77.HuffmanTree.swift:6-405``):

* ``validate`` mirrors the leaf-count arithmetic at ``:80-174`` including the
  0/1-symbol stubs;
* ``decode_table`` plays the role of the two-level ``InflatorTables`` LUT
  (``Sources/LZ77/Inflator/LZ77.InflatorTables.swift:16-62``) — but as a
  *single flat gather LUT* indexed by the bit-reversed next-``max_len`` bits,
  which is the natural shape for a TPU gather;
* ``lengths_from_frequencies`` replaces the reference's heap +
  ``limitHeight`` construction (``:247-404``) with package-merge, which is
  *optimal* for length-limited codes (≤ the reference's sizes by design).
"""

from __future__ import annotations

import numpy as np

from ..utils.bits import reverse_bits


class HuffmanError(ValueError):
    pass


def validate(lengths: np.ndarray) -> None:
    """Check that nonzero ``lengths`` form a complete canonical Huffman code.

    Zero used symbols is accepted (empty tree — legal for DEFLATE distance
    trees); exactly one used symbol is accepted as a 1-bit stub (matching
    ``HuffmanTree.validate`` symbol-stub behavior at
    ``LZ77.HuffmanTree.swift:112-174``); otherwise the Kraft sum must be
    exactly 1.
    """
    used = lengths[lengths > 0]
    if used.size <= 1:
        return
    max_len = int(used.max())
    kraft = int((1 << max_len >> used.astype(np.int64)).sum())
    if kraft != (1 << max_len):
        raise HuffmanError(
            f"code lengths are {'over' if kraft > (1 << max_len) else 'under'}"
            f"-subscribed (kraft {kraft} / {1 << max_len})"
        )


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Assign canonical codewords (MSB-first integers) per RFC 1951 §3.2.2."""
    lengths = np.asarray(lengths, dtype=np.int64)
    max_len = int(lengths.max(initial=0))
    bl_count = np.bincount(lengths, minlength=max_len + 1)
    bl_count[0] = 0
    next_code = np.zeros(max_len + 2, dtype=np.int64)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + int(bl_count[l - 1])) << 1
        next_code[l] = code
    codes = np.zeros_like(lengths)
    for sym in range(lengths.size):
        l = int(lengths[sym])
        if l:
            codes[sym] = next_code[l]
            next_code[l] += 1
    return codes


def decode_table(lengths: np.ndarray, max_len: int = 15) -> np.ndarray:
    """Build a flat decode LUT of size ``2**max_len``.

    Entry layout (uint32): ``(length << 16) | symbol``.  Indexed directly by
    the next ``max_len`` bits peeked LSB-first from the stream (codewords are
    bit-reversed into the index so no per-token reversal is needed at decode
    time — same trick as the reference's bit-reversed codeword index at
    ``LZ77.InflatorTables.swift:113-119``).

    Single-symbol trees decode that symbol with a 1-bit code; entries for
    unreachable indices are 0 (length 0 ⇒ invalid ⇒ decode error).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    validate(lengths)
    table = np.zeros(1 << max_len, dtype=np.uint32)
    used = np.nonzero(lengths)[0]
    if used.size == 0:
        return table
    if used.size == 1:
        sym = int(used[0])
        eff = np.zeros_like(lengths)
        eff[sym] = 1
        codes = np.zeros_like(lengths)
    else:
        eff = lengths
        codes = canonical_codes(lengths)
    for sym in used:
        l = int(eff[sym])
        c = int(codes[sym])
        rev = reverse_bits(c, l)
        entry = (l << 16) | int(sym)
        step = 1 << l
        table[rev::step] = entry
    return table


def lengths_from_frequencies(
    frequencies: np.ndarray, limit: int, force: bool = True
) -> np.ndarray:
    """Optimal length-limited code lengths via package-merge.

    ``force`` ensures at least two symbols get codes when only 0–1 have
    nonzero frequency (DEFLATE requires the literal tree to encode at least
    the end-of-block symbol; emitting two 1-bit codes keeps the table
    serializable exactly like the reference's stub handling).
    """
    freqs = np.asarray(frequencies, dtype=np.int64)
    n = freqs.size
    used = np.nonzero(freqs)[0]
    lengths = np.zeros(n, dtype=np.int64)
    if used.size == 0:
        if force and n >= 2:
            lengths[0] = lengths[1] = 1
        return lengths
    if used.size == 1:
        lengths[used[0]] = 1
        if force:
            other = 0 if used[0] != 0 else 1
            if n >= 2:
                lengths[other] = 1
        return lengths
    if used.size > (1 << limit):
        raise HuffmanError("too many symbols for the length limit")

    # package-merge: lengths[sym] = number of times sym appears across the
    # first (2·n_used - 2) items of the merged package hierarchy.
    items = sorted((int(freqs[s]), int(s)) for s in used)
    # each entry of `packages` is (weight, symbol-count-vector as dict)
    level = [(w, (s,)) for w, s in items]
    solution: list[tuple[int, tuple[int, ...]]] = []
    for _ in range(limit - 1):
        paired = []
        for i in range(0, len(level) - 1, 2):
            w = level[i][0] + level[i + 1][0]
            syms = level[i][1] + level[i + 1][1]
            paired.append((w, syms))
        level = sorted(paired + [(w, (s,)) for w, s in items])
    take = 2 * used.size - 2
    counts = np.zeros(n, dtype=np.int64)
    # final merge level contributes code-length increments
    # pm: total lengths = sum over all levels of membership in taken packages
    # (re-run: the loop above already merged levels into `level` cumulatively)
    for w, syms in level[:take]:
        for s in syms:
            counts[s] += 1
    lengths[used] = counts[used]
    return lengths
