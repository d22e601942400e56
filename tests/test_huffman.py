"""Canonical Huffman construction and decode-table properties."""

import heapq
import random

import numpy as np
import pytest

from swift_png_tpu.lz77.huffman import (
    HuffmanError,
    canonical_codes,
    decode_table,
    lengths_from_frequencies,
    validate,
)
from swift_png_tpu.utils.bits import reverse_bits


def _huffman_cost(freqs):
    heap = [f for f in freqs if f > 0]
    heapq.heapify(heap)
    if len(heap) <= 1:
        return sum(heap)
    cost = 0
    while len(heap) > 1:
        a, b = heapq.heappop(heap), heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    return cost


def test_package_merge_optimal_when_unconstrained():
    rng = random.Random(0)
    for _ in range(100):
        n = rng.randint(2, 60)
        freqs = np.array(
            [rng.choice([0, 0, 1, 2, 3, 10, 100, 1000]) for _ in range(n)],
            dtype=np.int64,
        )
        if freqs.sum() == 0:
            freqs[0] = 5
        lengths = lengths_from_frequencies(freqs, 15)
        if (freqs > 0).sum() > 1:
            assert int((lengths * freqs).sum()) == _huffman_cost(freqs.tolist())
            validate(lengths)
        assert lengths.max() <= 15


def test_length_limit_binds():
    # 40 symbols with exponential frequencies would want depth > 7
    freqs = np.array([1 << min(i, 40) for i in range(40)], dtype=np.int64)
    lengths = lengths_from_frequencies(freqs, 7)
    assert lengths.max() <= 7
    validate(lengths)


def test_decode_table_roundtrip():
    lengths = lengths_from_frequencies(np.array([5, 5, 5, 5, 2, 2, 1, 1, 0, 3]), 15)
    codes = canonical_codes(lengths)
    table = decode_table(lengths, 15)
    for sym in range(lengths.size):
        l = int(lengths[sym])
        if not l:
            continue
        idx = reverse_bits(int(codes[sym]), l)
        entry = int(table[idx])
        assert entry >> 16 == l and entry & 0xFFFF == sym


def test_validate_rejects_bad_lengths():
    with pytest.raises(HuffmanError):
        validate(np.array([1, 1, 1]))  # over-subscribed
    with pytest.raises(HuffmanError):
        validate(np.array([2, 2, 2]))  # incomplete
    validate(np.array([1, 0, 0]))  # single-symbol stub ok
    validate(np.array([0, 0, 0]))  # empty ok
