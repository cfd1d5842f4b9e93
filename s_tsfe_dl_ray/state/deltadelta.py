"""Delta-of-delta compression for int64 timestamps (exact round-trip).

Algorithm from the published Gorilla paper (Pelkonen et al., VLDB 2015,
§4.1.1), with widened buckets for microsecond-resolution transcripts
(the paper's buckets target second-resolution telemetry):

- first ts: raw 64 bits; first delta: raw 66 bits (zigzag; int64 deltas
  can span 65 bits)
- each next ts: D = (tsᵢ − tsᵢ₋₁) − (tsᵢ₋₁ − tsᵢ₋₂)
  - D == 0              → ``0``
  - fits  7 bits zigzag → ``10``   + 7
  - fits 12 bits zigzag → ``110``  + 12
  - fits 24 bits zigzag → ``1110`` + 24
  - fits 36 bits zigzag → ``11110``+ 36
  - else                → ``11111``+ 66

Engine role: the timestamp half of the per-partition carried encoder
state (previous ts + previous delta carried across rows — the reference's
ordered recurrence, SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .bits import BitReader, BitWriter

_BUCKETS = (  # (control value, control bits, payload bits)
    (0b10, 2, 7),
    (0b110, 3, 12),
    (0b1110, 4, 24),
    (0b11110, 5, 36),
)
# zigzag thresholds for vectorized bucket choice (np.digitize)
_Z_THRESH = np.array([1 << 7, 1 << 12, 1 << 24, 1 << 36], dtype=np.uint64)


def _zigzag(v: int) -> int:
    # arbitrary-precision zigzag (no 64-bit shift tricks: deltas of int64
    # values are Python ints up to 65 bits here)
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


class DeltaDeltaCodec:
    MAGIC = b"DOD1"

    def encode(self, ts: np.ndarray) -> bytes:
        vals = np.ascontiguousarray(ts, dtype=np.int64)
        n = len(vals)
        if n == 0:
            return self.MAGIC + struct.pack("<I", 0)
        if n == 1:
            w = BitWriter()
            w.write(int(vals[0]) & ((1 << 64) - 1), 64)
            return self.MAGIC + struct.pack("<I", 1) + w.getvalue()
        # Fast path: int64 deltas/dods computed vectorized.  int64
        # differences CAN overflow (they need up to 65 bits); detect
        # wraparound — ovf(b−a)=((a^b)&(b^wrapped))<0 — and fall back to
        # the exact Python-int loop on any hit (pathological inputs only;
        # real timestamp streams never overflow).
        a, b = vals[:-1], vals[1:]
        d = b - a  # numpy wraps silently
        if (((a ^ b) & (b ^ d)) < 0).any():
            return self._encode_slow(vals)
        dd = d[1:] - d[:-1]
        if (((d[:-1] ^ d[1:]) & (d[1:] ^ dd)) < 0).any():
            return self._encode_slow(vals)
        # vectorized zigzag + bucket choice; zigzag(int64) always fits
        # uint64, and numpy's wrapping << gives exactly that value
        z = ((dd << np.int64(1)) ^ (dd >> np.int64(63))).view(np.uint64)
        idx = np.digitize(z, _Z_THRESH).tolist()
        buf = bytearray()
        acc = int(vals[0]) & ((1 << 64) - 1)
        acc = (acc << 66) | _zigzag(int(d[0]))
        nacc = 64 + 66
        for zi, i in zip(z.tolist(), idx):
            if zi == 0:
                acc <<= 1
                nacc += 1
            elif i < 4:
                ctrl, cbits, pbits = _BUCKETS[i]
                acc = (acc << (cbits + pbits)) | (ctrl << pbits) | zi
                nacc += cbits + pbits
            else:
                acc = (acc << 71) | (0b11111 << 66) | zi
                nacc += 71
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

    def _encode_slow(self, vals: np.ndarray) -> bytes:
        """Exact Python-int path for streams whose deltas/dods overflow
        int64 (identical wire format to the fast path)."""
        n = len(vals)
        w = BitWriter()
        w.write(int(vals[0]) & ((1 << 64) - 1), 64)
        pyvals = vals.tolist()
        deltas = [y - x for x, y in zip(pyvals, pyvals[1:])]
        w.write(_zigzag(deltas[0]), 66)
        for d in (y - x for x, y in zip(deltas, deltas[1:])):
            if d == 0:
                w.write(0, 1)
                continue
            z = _zigzag(d)
            for ctrl, cbits, pbits in _BUCKETS:
                if z < (1 << pbits):
                    w.write(ctrl, cbits)
                    w.write(z, pbits)
                    break
            else:
                w.write(0b11111, 5)
                w.write(z, 66)
        return self.MAGIC + struct.pack("<I", n) + w.getvalue()

    def decode(self, blob: bytes) -> np.ndarray:
        assert blob[:4] == self.MAGIC, "not a delta-of-delta blob"
        (n,) = struct.unpack_from("<I", blob, 4)
        out = np.empty(n, dtype=np.int64)
        if n == 0:
            return out
        r = BitReader(blob[8:])
        first = r.read(64)
        if first >= 1 << 63:
            first -= 1 << 64
        out[0] = first
        if n == 1:
            return out
        delta = _unzigzag(r.read(66))
        cur = first + delta
        out[1] = cur
        for i in range(2, n):
            if r.read(1) == 0:
                pass  # dod == 0
            else:
                # walk the unary control prefix
                depth = 1
                while depth < 5 and r.read(1) == 1:
                    depth += 1
                if depth < 5:
                    pbits = _BUCKETS[depth - 1][2]
                    delta += _unzigzag(r.read(pbits))
                else:
                    delta += _unzigzag(r.read(66))
            cur += delta
            out[i] = cur
        return out

    @staticmethod
    def state_hash(blob: bytes) -> str:
        return hashlib.sha256(blob).hexdigest()[:16]
