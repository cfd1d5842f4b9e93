"""Delta-of-delta compression for int64 timestamps (exact round-trip).

Algorithm from the published Gorilla paper (Pelkonen et al., VLDB 2015,
§4.1.1): store the second difference D = (tsᵢ − tsᵢ₋₁) − (tsᵢ₋₁ − tsᵢ₋₂);
regular cadences make almost every D zero.

Wire format ``DOD2`` (round 4 — VERDICT r3 #4): the paper's per-value
variable-length bucket controls ('0'/'10'+7/'110'+12/…) force a
sequential decoder, so — like the GOR2 float format — the stream splits
into independently-decodable sections with a RUN-BASED payload width
(64 values per run, width = bits of the run's largest zigzag):

    DOD2 | u32 n | u16 run | i64 first-ts | i64 first-delta
         | nonzero bitmap (1 bit per DoD, MSB-first)
         | per-run header (u8 payload bits; 0 marks an all-zero run)
         | payload bitstream (zigzag(DoD), run-width bits each)

Both directions are pure numpy: encode = wrapped int64 diffs (+ exact
overflow guards) + ``np.maximum.reduceat`` + ``pack_fields``; decode =
``unpack_fields`` + vectorized unzigzag + two ``np.cumsum`` prefix
scans.  Zero DoDs (the overwhelmingly common case on regular grids)
still cost 1 bit.

Streams whose deltas or delta-of-deltas overflow int64 (pathological —
real timestamp streams never do) fall back to the exact Python-int slow
path, which emits the legacy ``DOD1`` greedy-bucket format; the scalar
DOD1 decoder is retained for those blobs and for pre-round-4 lineage
manifests.

Engine role: the timestamp half of the per-partition carried encoder
state (previous ts + previous delta carried across rows — the
reference's ordered recurrence, SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .bits import BitReader, BitWriter, bit_lengths, pack_fields, unpack_fields

_BUCKETS = (  # legacy DOD1 (control value, control bits, payload bits)
    (0b10, 2, 7),
    (0b110, 3, 12),
    (0b1110, 4, 24),
    (0b11110, 5, 36),
)

_RUN = 64


def _zigzag(v: int) -> int:
    # arbitrary-precision zigzag (no 64-bit shift tricks: deltas of int64
    # values are Python ints up to 65 bits in the slow path)
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


class DeltaDeltaCodec:
    MAGIC = b"DOD2"
    MAGIC_V1 = b"DOD1"

    def encode(self, ts: np.ndarray) -> bytes:
        vals = np.ascontiguousarray(ts, dtype=np.int64)
        n = len(vals)
        head = self.MAGIC + struct.pack("<IH", n, _RUN)
        if n == 0:
            return head
        if n == 1:
            return head + struct.pack("<q", int(vals[0]))
        # int64 differences CAN overflow (they need up to 65 bits); detect
        # wraparound — ovf(b−a) = ((a^b)&(b^wrapped)) < 0 — and fall back
        # to the exact Python-int loop on any hit.
        a, b = vals[:-1], vals[1:]
        d = b - a  # numpy wraps silently
        if (((a ^ b) & (b ^ d)) < 0).any():
            return self._encode_slow(vals)
        head += struct.pack("<qq", int(vals[0]), int(d[0]))
        if n == 2:
            return head
        dd = d[1:] - d[:-1]
        if (((d[:-1] ^ d[1:]) & (d[1:] ^ dd)) < 0).any():
            return self._encode_slow(vals)
        # vectorized zigzag: zigzag(int64) always fits uint64, and numpy's
        # wrapping << gives exactly that value
        z = ((dd << np.int64(1)) ^ (dd >> np.int64(63))).view(np.uint64)
        m = n - 2
        nz = z != 0
        run_starts = np.arange(0, m, _RUN)
        pb_r = np.maximum.reduceat(np.where(nz, bit_lengths(z), 0), run_starts)
        idx = np.flatnonzero(nz)
        run_nz = idx // _RUN
        payload = pack_fields(z[idx], pb_r[run_nz])
        return (head + np.packbits(nz).tobytes()
                + pb_r.astype(np.uint8).tobytes() + payload)

    def _encode_slow(self, vals: np.ndarray) -> bytes:
        """Exact Python-int path for streams whose deltas/dods overflow
        int64 — emits the legacy greedy-bucket DOD1 wire format."""
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
        return self.MAGIC_V1 + struct.pack("<I", n) + w.getvalue()

    def decode(self, blob: bytes) -> np.ndarray:
        if blob[:4] == self.MAGIC_V1:
            return self._decode_v1(blob)
        assert blob[:4] == self.MAGIC, "not a delta-of-delta blob"
        n, run = struct.unpack_from("<IH", blob, 4)
        out = np.empty(n, dtype=np.int64)
        if n == 0:
            return out
        (out[0],) = struct.unpack_from("<q", blob, 10)
        if n == 1:
            return out
        (d0,) = struct.unpack_from("<q", blob, 18)
        deltas = np.empty(n - 1, dtype=np.int64)
        deltas[0] = d0
        if n > 2:
            m = n - 2
            off = 26
            nbm = (m + 7) // 8
            nz = np.unpackbits(
                np.frombuffer(blob, np.uint8, nbm, off), count=m
            ).astype(bool)
            off += nbm
            nruns = -(-m // run)
            pb_r = np.frombuffer(blob, np.uint8, nruns, off).astype(np.int64)
            off += nruns
            idx = np.flatnonzero(nz)
            run_nz = idx // run
            nb = pb_r[run_nz]
            starts = np.cumsum(nb) - nb
            z = np.zeros(m, dtype=np.uint64)
            z[idx] = unpack_fields(blob[off:], starts, nb)
            # vectorized unzigzag; encode guaranteed every delta fits
            # int64, so the wrapped cumsums reconstruct them exactly
            dd = (z >> np.uint64(1)).astype(np.int64) ^ -(
                (z & np.uint64(1)).astype(np.int64)
            )
            deltas[1:] = dd
            np.cumsum(deltas, out=deltas)
        out[1:] = out[0] + np.cumsum(deltas)
        return out

    def _decode_v1(self, blob: bytes) -> np.ndarray:
        """Scalar decode of legacy / slow-path DOD1 blobs."""
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
