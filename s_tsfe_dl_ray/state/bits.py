"""MSB-first bit-stream primitives shared by the Gorilla XOR float codec
and the delta-of-delta timestamp codec.

Two layers:

- :func:`pack_fields` / :func:`unpack_fields` — fully vectorized
  variable-width bit-field packing over numpy (the round-4 codec hot
  path): field i contributes the low ``nbits[i]`` bits of ``words[i]``,
  concatenated MSB-first.  Packing scatters each field's 128-bit aligned
  image into a uint64 word array with ``np.bitwise_or.at`` (fields never
  overlap, so OR is exact); extraction gathers the two aligned words
  covering each field and shifts them together.  No Python per-value
  loop in either direction.
- :class:`BitWriter` / :class:`BitReader` — the scalar fallback, kept
  for the delta-of-delta overflow slow path and for decoding legacy
  (GOR1/DOD1) blobs out of pre-round-4 lineage manifests.
"""

from __future__ import annotations

import numpy as np

_U0 = np.uint64(0)
_U1 = np.uint64(1)
_U63 = np.uint64(63)
_U64 = np.uint64(64)

# byte-wise popcount LUT (numpy 1.26 has no bitwise_count)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1, dtype=np.int64
)


def bit_lengths(a: np.ndarray) -> np.ndarray:
    """Vectorized bit_length of a uint64 array (0 → 0): smear the MSB
    down, then popcount the all-ones-below-MSB pattern byte-wise."""
    sm = a.copy()
    for s in (1, 2, 4, 8, 16, 32):
        sm |= sm >> np.uint64(s)
    return _POP8[sm.view(np.uint8).reshape(-1, 8)].sum(axis=1, dtype=np.int64)


def pack_fields(words: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate the low ``nbits[i]`` bits of ``words[i]`` MSB-first.

    ``words`` uint64, ``nbits`` int in [1, 64] per element.  Vectorized:
    every field spans at most two 64-bit output words once aligned, so
    its 128-bit image splits into a (hi, lo) uint64 pair OR-scattered at
    (word_idx, word_idx+1).
    """
    words = np.ascontiguousarray(words, dtype=np.uint64)
    nb = np.ascontiguousarray(nbits, dtype=np.uint64)
    if len(words) == 0:
        return b""
    ends = np.cumsum(nb)
    total = int(ends[-1])
    starts = ends - nb
    widx = (starts >> np.uint64(6)).astype(np.int64)
    bit = starts & _U63
    # left-shift distance of the field inside its 128-bit window;
    # nbits<=64 and bit<=63 → s in [1, 127]
    s = np.uint64(128) - nb - bit
    ge64 = s >= _U64
    # shift counts clamped to [0, 63] so no undefined >=64 shifts execute
    # even on the branch np.where discards
    sh_hi_a = np.minimum(s - _U64, _U63)          # valid where ge64
    sh_hi_b = np.minimum(_U64 - s, _U63)          # valid where ~ge64 (s>=1)
    hi = np.where(ge64, words << np.where(ge64, sh_hi_a, _U0),
                  words >> np.where(ge64, _U0, sh_hi_b))
    lo = np.where(ge64, _U0, words << np.minimum(s, _U63))
    out = np.zeros((total + 63) // 64 + 1, dtype=np.uint64)
    np.bitwise_or.at(out, widx, hi)
    np.bitwise_or.at(out, widx + 1, lo)
    return out.byteswap().tobytes()[: (total + 7) // 8]


def unpack_fields(data: bytes, starts: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    """Extract variable-width bit fields at known bit offsets (inverse of
    :func:`pack_fields` given the same ``nbits`` and exclusive-prefix-sum
    ``starts``).  Returns uint64 values (high bits zero)."""
    st = np.ascontiguousarray(starts, dtype=np.uint64)
    nb = np.ascontiguousarray(nbits, dtype=np.uint64)
    if len(st) == 0:
        return np.empty(0, dtype=np.uint64)
    pad = (-len(data)) % 8 + 8  # round up to words + one guard word
    words = np.frombuffer(data + b"\x00" * pad, dtype=">u8").astype(np.uint64)
    widx = (st >> np.uint64(6)).astype(np.int64)
    bit = st & _U63
    w0 = words[widx]
    w1 = words[widx + 1]
    has_spill = bit > _U0
    rs = np.where(has_spill, _U64 - bit, _U1)  # clamp the discarded branch
    left = (w0 << bit) | np.where(has_spill, w1 >> rs, _U0)
    return left >> (_U64 - nb)


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
