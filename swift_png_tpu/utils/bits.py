"""Bit-level utilities shared by the LZ77 and PNG layers.

Behavioral counterparts of the reference's bitstream utilities
(``Sources/LZ77/Inflator/LZ77.InflatorIn.swift``,
``Sources/LZ77/Deflator/LZ77.DeflatorOut.swift``,
``Sources/LZ77/LZ77.Reversed.swift``), re-designed around numpy arrays so the
same tables feed the Pallas device kernels.
"""

from __future__ import annotations

import numpy as np


def _build_reversed() -> np.ndarray:
    # 256-entry byte bit-reversal LUT (reference: Sources/LZ77/LZ77.Reversed.swift:3-53)
    table = np.zeros(256, dtype=np.uint8)
    for value in range(256):
        rev = 0
        for bit in range(8):
            if value & (1 << bit):
                rev |= 1 << (7 - bit)
        table[value] = rev
    return table


#: byte bit-reversal lookup table
REVERSED: np.ndarray = _build_reversed()


def reverse_bits(value: int, width: int) -> int:
    """Reverse the low ``width`` bits of ``value``."""
    result = 0
    for _ in range(width):
        result = (result << 1) | (value & 1)
        value >>= 1
    return result


class BitReader:
    """LSB-first bit reader over a byte buffer.

    DEFLATE packs bits LSB-first within each byte (RFC 1951 §3.1.1).  The
    reference implements this over ``[UInt16]`` atoms
    (``LZ77.InflatorIn.swift:156-198``); here we precompute a uint64 sliding
    view over a numpy byte array, which keeps single-token reads cheap in the
    host fallback path and matches what the native engine does.
    """

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes | bytearray | memoryview | np.ndarray):
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        self.data = bytes(data)
        self.pos = 0  # bit cursor
        self.nbits = 8 * len(self.data)

    def extend(self, more: bytes) -> None:
        self.data += bytes(more)
        self.nbits = 8 * len(self.data)

    @property
    def remaining(self) -> int:
        return self.nbits - self.pos

    def peek(self, count: int) -> int:
        """Peek up to ``count`` bits (LSB-first); missing bits read as zero."""
        byte0 = self.pos >> 3
        window = int.from_bytes(self.data[byte0 : byte0 + 8], "little")
        return (window >> (self.pos & 7)) & ((1 << count) - 1)

    def skip(self, count: int) -> None:
        self.pos += count

    def read(self, count: int) -> int:
        value = self.peek(count)
        self.pos += count
        return value

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, count: int) -> bytes:
        assert self.pos & 7 == 0
        start = self.pos >> 3
        out = self.data[start : start + count]
        self.pos += 8 * count
        return out


class BitWriter:
    """LSB-first bit writer producing a byte buffer.

    Counterpart of ``LZ77.DeflatorOut`` (``LZ77.DeflatorOut.swift:105-147``):
    codewords are appended LSB-first; ``pad`` aligns to a byte boundary with
    zero bits.
    """

    __slots__ = ("_chunks", "_acc", "_accbits")

    def __init__(self) -> None:
        self._chunks: list[bytes] = []
        self._acc = 0
        self._accbits = 0

    def write(self, value: int, count: int) -> None:
        self._acc |= (value & ((1 << count) - 1)) << self._accbits
        self._accbits += count
        if self._accbits >= 64:
            nbytes = self._accbits >> 3
            self._chunks.append(self._acc.to_bytes(nbytes + 8, "little")[:nbytes])
            self._acc >>= 8 * nbytes
            self._accbits -= 8 * nbytes

    def pad_to_byte(self) -> None:
        if self._accbits & 7:
            self._accbits = (self._accbits + 7) & ~7

    def write_bytes(self, data: bytes) -> None:
        self.pad_to_byte()
        self._flush_acc()
        self._chunks.append(bytes(data))

    def _flush_acc(self) -> None:
        nbytes = (self._accbits + 7) >> 3
        if nbytes:
            self._chunks.append(self._acc.to_bytes(nbytes, "little"))
        self._acc = 0
        self._accbits = 0

    @property
    def bit_length(self) -> int:
        return 8 * sum(len(c) for c in self._chunks) + self._accbits

    def drain(self) -> bytes:
        """Remove and return all *completed* bytes, leaving any partial byte
        (0–7 bits) in the accumulator so the bitstream continues seamlessly.

        This is what lets the container pop output chunks mid-stream (the
        reference's ``DeflatorOut.pop``/``pull``) without corrupting bit
        alignment."""
        nbytes = self._accbits >> 3
        if nbytes:
            mask = (1 << (8 * nbytes)) - 1
            self._chunks.append((self._acc & mask).to_bytes(nbytes, "little"))
            self._acc >>= 8 * nbytes
            self._accbits -= 8 * nbytes
        out = b"".join(self._chunks)
        self._chunks = []
        return out

    def getvalue(self) -> bytes:
        """Finish (byte-aligning with zeros) and return the bytes."""
        self.pad_to_byte()
        self._flush_acc()
        out = b"".join(self._chunks)
        self._chunks = [out]
        return out
