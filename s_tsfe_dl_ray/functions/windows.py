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


def window_start_us(ts: pa.ChunkedArray | pa.Array, tier: str) -> pa.ChunkedArray:
    """floor(ts, tier) as int64 µs-since-epoch (vectorized, zero-copy cast)."""
    size = TIER_US[tier]
    us = pc.cast(ts, pa.int64())
    return pc.multiply(pc.divide(us, size), size)  # integer division floors


def rewindow_us(window_start: pa.ChunkedArray, tier: str) -> pa.ChunkedArray:
    """Re-assign an int64 window_start to a coarser tier (cascade step)."""
    size = TIER_US[tier]
    return pc.multiply(pc.divide(window_start, size), size)


def window_to_timestamp(window_start: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(window_start, pa.timestamp("us"))
