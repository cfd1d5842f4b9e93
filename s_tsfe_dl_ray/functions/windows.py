"""Window-assignment scalar functions.

The reference's window spec is ``length``/``stride``/``sampling_rate``
(timeseries_batch_generator.py:186-221); the engine's retention tiers are
tumbling windows (size == hop) on ``ts``: 1m / 1h / 1d.  Window assignment
is a pure vectorized Arrow kernel: floor the microsecond epoch to the tier
size.  Kept as int64 (µs since epoch) through shuffles — cheaper group keys
than timestamps — and converted back to timestamp[us] only at finalize.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TIER_US: dict[str, int] = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
}

#: cascade order: each tier is an exact re-aggregation of the previous
TIER_ORDER = ("1m", "1h", "1d")


def _floor_to(us: pa.ChunkedArray | pa.Array, size: int) -> pa.ChunkedArray:
    """FLOOR (not truncate) ``us`` to a multiple of ``size``.

    pyarrow integer divide truncates toward zero, so plain
    ``(us/size)*size`` maps pre-epoch timestamps to the WRONG (later)
    window — e.g. −30 s would land in window 0 instead of −60 s — and
    diverges from DuckDB ``date_trunc`` (which floors).  Subtracting the
    nonnegative Euclidean remainder ``((us % size) + size) % size``
    floors for any sign.
    """
    # rem = us - trunc(us/size)*size, range (−size, size); normalize sign:
    rem = pc.subtract(us, pc.multiply(pc.divide(us, size), size))
    rem = pc.if_else(pc.less(rem, 0), pc.add(rem, size), rem)
    return pc.subtract(us, rem)


def _tier_us(tier: "str | int") -> int:
    """Resolve a tier to µs: a registered tier name or a raw int µs size
    (hopping windows use arbitrary hop grids, e.g. 15 min panes)."""
    return TIER_US[tier] if isinstance(tier, str) else int(tier)


def window_start_us(ts: pa.ChunkedArray | pa.Array, tier: "str | int") -> pa.ChunkedArray:
    """floor(ts, tier) as int64 µs-since-epoch (vectorized, zero-copy cast).
    Floors correctly for pre-epoch (negative) timestamps."""
    if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
        # normalize first: a verbatim int64 cast of e.g. a ns-precision
        # column (pandas default) would mis-window by 1000×
        ts = pc.cast(ts, pa.timestamp("us", tz=ts.type.tz))
    return _floor_to(pc.cast(ts, pa.int64()), _tier_us(tier))


def rewindow_us(window_start: pa.ChunkedArray, tier: "str | int") -> pa.ChunkedArray:
    """Re-assign an int64 window_start to a coarser tier (cascade step)."""
    return _floor_to(window_start, _tier_us(tier))


def window_to_timestamp(window_start: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(window_start, pa.timestamp("us"))
