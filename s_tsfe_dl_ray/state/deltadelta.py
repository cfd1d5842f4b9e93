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
        w = BitWriter()
        if n == 0:
            return self.MAGIC + struct.pack("<I", 0)
        w.write(int(vals[0]) & ((1 << 64) - 1), 64)
        if n == 1:
            return self.MAGIC + struct.pack("<I", 1) + w.getvalue()
        # Python-int deltas: int64 differences can overflow int64
        pyvals = vals.tolist()
        deltas = [b - a for a, b in zip(pyvals, pyvals[1:])]
        w.write(_zigzag(deltas[0]), 66)
        for d in (b - a for a, b in zip(deltas, deltas[1:])):
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
