"""Gorilla XOR compression for float64 series (exact round-trip).

Algorithm from the published Gorilla paper (Pelkonen et al., "Gorilla: A
Fast, Scalable, In-Memory Time Series Database", VLDB 2015, §4.1.2):

- first value: raw 64 bits
- each next value: XOR with the previous value's bits
  - xor == 0            → control bit ``0``
  - fits prior window   → ``10`` + meaningful bits (previous leading/
                           trailing-zero window reused)
  - new window          → ``11`` + 6 bits leading-zero count + 6 bits
                           (meaningful-length − 1) + meaningful bits

(The paper uses 5 lz bits; we use 6 so lz up to 63 never clamps —
format is self-describing via the header below, not wire-compatible.)

Engine role: this is the per-partition carried state of the reference's
recurrent scans (models_keras.py:64 LSTM hidden state carried across
timesteps → here, the previous value + window carried across rows), and
the compress/decompress pair is the analog of the reference autoencoder's
encode/bottleneck/decode (models_keras.py:1055-1091 YildirimOzal) — with
*exact* reconstruction instead of learned-lossy.

The control-plane per value is a tight Python loop over precomputed
vectorized XORs (numpy); payload layout: ``uint32 count`` then bitstream.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .bits import BitReader

# byte-wise popcount LUT (numpy 1.26 has no bitwise_count)
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1, dtype=np.int64
)


def _bit_lengths(a: np.ndarray) -> np.ndarray:
    """Vectorized bit_length of a uint64 array (0 → 0): smear the MSB
    down, then popcount the all-ones-below-MSB pattern byte-wise."""
    sm = a.copy()
    for s in (1, 2, 4, 8, 16, 32):
        sm |= sm >> np.uint64(s)
    return _POP8[sm.view(np.uint8).reshape(-1, 8)].sum(axis=1, dtype=np.int64)


class GorillaCodec:
    """Stateless codec object (encode/decode whole arrays exactly)."""

    MAGIC = b"GOR1"

    def encode(self, values: np.ndarray) -> bytes:
        bits = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
        n = len(bits)
        if n == 0:
            return self.MAGIC + struct.pack("<I", 0)
        xors = (bits[:-1] ^ bits[1:]) if n > 1 else np.empty(0, np.uint64)
        # control plane precomputed vectorized: leading/trailing zero
        # counts for every xor in three numpy passes (the per-value
        # bit_length() calls dominated the old loop)
        lzs = (64 - _bit_lengths(xors)).tolist()
        lsb = xors & (~xors + np.uint64(1))
        tzs = _bit_lengths(lsb - np.uint64(1)).tolist()  # popcount(lsb-1)
        # bit packing: one fused (value, nbits) append per xor into a
        # Python-int accumulator, flushed to bytes in chunks (the old
        # BitWriter flushed byte-at-a-time per write call)
        buf = bytearray()
        acc = int(bits[0])
        nacc = 64
        prev_lz, prev_tz = -1, -1  # no window yet
        for x, lz, tz in zip(xors.tolist(), lzs, tzs):
            if x == 0:
                acc <<= 1
                nacc += 1
            elif prev_lz >= 0 and lz >= prev_lz and tz >= prev_tz:
                mb = 64 - prev_lz - prev_tz
                acc = (acc << (2 + mb)) | (0b10 << mb) | (x >> prev_tz)
                nacc += 2 + mb
            else:
                mb = 64 - lz - tz
                acc = (acc << (14 + mb)) | (
                    ((0b11 << 12) | (lz << 6) | (mb - 1)) << mb
                ) | (x >> tz)
                nacc += 14 + mb
                prev_lz, prev_tz = lz, tz
            if nacc >= 1024:
                keep = nacc & 7
                buf += (acc >> keep).to_bytes((nacc - keep) >> 3, "big")
                acc &= (1 << keep) - 1
                nacc = keep
        if nacc & 7:
            pad = 8 - (nacc & 7)
            acc <<= pad
            nacc += pad
        buf += acc.to_bytes(nacc >> 3, "big")
        return self.MAGIC + struct.pack("<I", n) + bytes(buf)

    def decode(self, blob: bytes) -> np.ndarray:
        assert blob[:4] == self.MAGIC, "not a Gorilla blob"
        (n,) = struct.unpack_from("<I", blob, 4)
        out = np.empty(n, dtype=np.uint64)
        if n == 0:
            return out.view(np.float64)
        r = BitReader(blob[8:])
        cur = r.read(64)
        out[0] = cur
        prev_lz = prev_tz = 0  # encoder emits '11' before any '10'
        for i in range(1, n):
            if r.read(1) == 0:
                out[i] = cur
                continue
            if r.read(1) == 0:  # '10' reuse window
                mbits = 64 - prev_lz - prev_tz
                x = r.read(mbits) << prev_tz
            else:  # '11' new window
                prev_lz = r.read(6)
                mbits = r.read(6) + 1
                prev_tz = 64 - prev_lz - mbits
                x = r.read(mbits) << prev_tz
            cur ^= x
            out[i] = cur
        return out.view(np.float64)

    @staticmethod
    def state_hash(blob: bytes) -> str:
        """Stable fingerprint of an encoded stream (lineage manifests)."""
        return hashlib.sha256(blob).hexdigest()[:16]
