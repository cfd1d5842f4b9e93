"""Minimal MSB-first bit stream reader/writer over a bytearray.

Shared by the Gorilla XOR float codec and the delta-of-delta timestamp
codec.  The writer keeps a small integer accumulator and flushes whole
bytes (O(1) amortized per append — never a growing bigint).
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0  # bit accumulator, < 2**(nacc)
        self.nacc = 0  # bits currently in acc (< 8 after flush)

    def write(self, value: int, nbits: int) -> None:
        """Append the low ``nbits`` of ``value`` (MSB-first)."""
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def getvalue(self) -> bytes:
        """Zero-pad the tail to a byte boundary and return the stream."""
        if self.nacc:
            return bytes(self.buf + bytes([(self.acc << (8 - self.nacc)) & 0xFF]))
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        end = pos + nbits
        # consume byte-wise
        while nbits > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail <= nbits else nbits
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self.pos = end
        return out
