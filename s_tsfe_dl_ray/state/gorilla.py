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

from .bits import BitReader, BitWriter


class GorillaCodec:
    """Stateless codec object (encode/decode whole arrays exactly)."""

    MAGIC = b"GOR1"

    def encode(self, values: np.ndarray) -> bytes:
        bits = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
        n = len(bits)
        w = BitWriter()
        if n == 0:
            return self.MAGIC + struct.pack("<I", 0)
        w.write(int(bits[0]), 64)
        xors = (bits[:-1] ^ bits[1:]) if n > 1 else np.empty(0, np.uint64)
        prev_lz, prev_tz = -1, -1  # no window yet
        for x in xors.tolist():
            if x == 0:
                w.write(0, 1)
                continue
            blen = x.bit_length()
            lz = 64 - blen
            tz = (x & -x).bit_length() - 1
            if prev_lz >= 0 and lz >= prev_lz and tz >= prev_tz:
                mbits = 64 - prev_lz - prev_tz
                w.write(0b10, 2)
                w.write(x >> prev_tz, mbits)
            else:
                mbits = blen - tz
                w.write(0b11, 2)
                w.write(lz, 6)
                w.write(mbits - 1, 6)
                w.write(x >> tz, mbits)
                prev_lz, prev_tz = lz, tz
        return self.MAGIC + struct.pack("<I", n) + w.getvalue()

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
